package graft.kg

/** Prompt construction (SURVEY.md P2).
  *
  * Mirrors the reference's prompt handlers
  * (reference: text2graph/prompt.py:41-147): a system message carrying the
  * extraction instructions plus an injected CSV of the dictionary mentions
  * found in the text ("known entities" pre-annotation), and a user message
  * carrying the text. Versioned like the reference (`stratname_v3`,
  * `mineral_v0`); the version string travels into provenance
  * (reference: text2graph/llm.py:302-311).
  *
  * Pure `(text, mentions) => Seq[Msg]` — usable inside a typed map and
  * testable without Spark.
  */
object Prompts {

  final case class Msg(role: String, content: String)

  sealed trait Handler {
    def version: String
    def objectKey: String // "stratigraphic_name" | "mineral_name"
    def ignoreCase: Boolean
    def systemPrompt(knownEntities: Seq[String]): String
    def messages(text: String, scanner: MentionScanner): Seq[Msg] = {
      // distinct mention words, order of first appearance
      // (reference: prompt.py:64-67,107-112 + A2 distinct)
      val known = scanner.findAll(text).map(_.word).distinct
      Seq(Msg("system", systemPrompt(known)), Msg("user", text))
    }
  }

  /** reference: text2graph/prompt.py:54-93 (StratPromptHandlerV3). */
  case object StratV3 extends Handler {
    val version = "stratname_v3"
    val objectKey = "stratigraphic_name"
    val ignoreCase = false
    def systemPrompt(known: Seq[String]): String =
      "You are a geology expert. Extract relationship triplets " +
        "(location, relationship, stratigraphic_name) from the user's text " +
        "as JSON {\"triplets\": [...]}. Only use stratigraphic names from " +
        s"this list: ${known.mkString(", ")}."
  }

  /** reference: text2graph/prompt.py:96-138 (MineralPromptHandlerV0) —
    * closed-world instruction plus USGS critical-minerals union
    * (prompt.py:100-105). */
  case object MineralV0 extends Handler {
    val version = "mineral_v0"
    val objectKey = "mineral_name"
    val ignoreCase = true
    def systemPrompt(known: Seq[String]): String =
      "You are a mineralogy expert. Extract relationship triplets " +
        "(location, relationship, mineral_name) from the user's text as " +
        "JSON {\"triplets\": [...]}. Do not include anything that is not " +
        s"on this list: ${known.mkString(", ")}."
  }

  /** reference: text2graph/prompt.py:141-147 (factory). */
  def handler(name: String): Handler = name match {
    case "stratname_v3" => StratV3
    case "mineral_v0" => MineralV0
    case other => throw new IllegalArgumentException(s"unknown prompt handler: $other")
  }

  /** Mixtral instruction-template wrap used by the batch job
    * (reference: chtc/preprocess_extraction_direct.py:65,130-134). */
  def mixtralWrap(msgs: Seq[Msg]): String =
    msgs.map {
      case Msg("system", c) => s"[INST] $c [/INST]"
      case Msg("user", c) => c
      case Msg(_, c) => c
    }.mkString("\n")
}
