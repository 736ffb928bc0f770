package graft.kg

import org.scalatest.funsuite.AnyFunSuite

class PromptsSpec extends AnyFunSuite {

  test("mineral prompt injects case-folded dictionary hits (test_prompt.py)") {
    // the reference asserts "gallium" is injected into the mineral system
    // prompt from the Sauk fixture text ("Gallium is found in Minnesota.")
    val scanner = MentionScanner(
      Dims.pinnedMinerals.map(_.mineral).toArray ++ Chem.CriticalMinerals,
      ignoreCase = true)
    val msgs = Prompts.MineralV0.messages(Fixtures.SaukText, scanner)
    assert(msgs.map(_.role) === Seq("system", "user"))
    assert(msgs.head.content.contains("gallium"))
    assert(msgs.head.content.contains("Do not include anything that is not"))
    assert(msgs(1).content === Fixtures.SaukText)
  }

  test("strat prompt injects exact-case mentions, distinct, in order") {
    val scanner = MentionScanner(Dims.pinnedStrat.map(_.strat_name).toArray,
      ignoreCase = false)
    val msgs = Prompts.StratV3.messages(Fixtures.SaukText, scanner)
    val sys = msgs.head.content
    assert(sys.contains("Shakopee"))
    assert(sys.contains("Sauk"))
    // distinct: "Sauk" occurs 3x in the text but once in the prompt list
    assert("\\bSauk\\b".r.findAllIn(sys).size === 1)
  }

  test("factory resolves versions; unknown rejected (prompt.py:141-147)") {
    assert(Prompts.handler("stratname_v3") === Prompts.StratV3)
    assert(Prompts.handler("mineral_v0") === Prompts.MineralV0)
    intercept[IllegalArgumentException](Prompts.handler("nope"))
  }

  test("mixtral template wraps system turn in [INST] (chtc:130-134)") {
    val out = Prompts.mixtralWrap(Seq(
      Prompts.Msg("system", "sys"), Prompts.Msg("user", "text")))
    assert(out === "[INST] sys [/INST]\ntext")
  }
}
