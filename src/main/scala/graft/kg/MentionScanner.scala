package graft.kg

import scala.collection.mutable

/** Multi-pattern whole-word dictionary matcher (SURVEY.md P1).
  *
  * Replaces the reference's O(|dict| * |text|) per-term regex loop
  * (reference: text2graph/macrostrat.py:118-154 — `\b{term}\b` finditer per
  * dictionary word) with a single-pass Aho-Corasick automaton built once per
  * executor from a broadcast dictionary. Semantics preserved exactly:
  *  - whole-word matches only: the char before the match start and after the
  *    match end must not be ASCII word chars [A-Za-z0-9_] (same boundary
  *    class as Python/RE2 `\b` on ASCII),
  *  - `ignoreCase` lowercases both dictionary and text (macrostrat.py:142-144:
  *    the mineral pipeline matches case-folded, strat matches exact),
  *  - results sorted by start offset (macrostrat.py:154),
  *  - overlapping occurrences of *different* terms are all reported, same as
  *    per-term finditer; occurrences of the same term are non-overlapping
  *    left-to-right, which for whole-word-bounded patterns equals finditer.
  *
  * Scale posture: the automaton is ~O(total dict chars) of int arrays, built
  * lazily once per (dictionary identity, case-mode) per JVM and shared by
  * all tasks — with a 45,646-term dictionary this is a few MB, broadcast
  * once, never rebuilt per row or per partition.
  */
final class MentionScanner private (
    terms: Array[String],
    ignoreCase: Boolean) extends Serializable {

  // Trie over the dictionary; nodes in a growable structure of HashMaps
  // (built once; match path is array/hash lookups only).
  private val children = mutable.ArrayBuffer(mutable.LongMap.empty[Int])
  private val fail = mutable.ArrayBuffer(0)
  // term indices ending at each node (via dict-suffix links, flattened)
  private val outputs = mutable.ArrayBuffer[List[Int]](Nil)

  private def norm(s: String): String = if (ignoreCase) s.toLowerCase else s

  locally {
    // build goto
    var t = 0
    while (t < terms.length) {
      val w = norm(terms(t))
      if (w.nonEmpty) {
        var node = 0
        var i = 0
        while (i < w.length) {
          val c = w.charAt(i).toLong
          node = children(node).getOrElse(c, {
            children += mutable.LongMap.empty[Int]
            fail += 0
            outputs += Nil
            val nn = children.length - 1
            children(node)(c) = nn
            nn
          })
          i += 1
        }
        outputs(node) = t :: outputs(node)
      }
      t += 1
    }
    // BFS failure links (standard construction; depth-1 nodes fail to root)
    val queue = mutable.Queue.empty[Int]
    children(0).foreach { case (_, v) => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        val target = children(f).getOrElse(c, 0)
        fail(v) = if (target == v) 0 else target
        outputs(v) = outputs(v) ++ outputs(fail(v))
        queue += v
      }
    }
  }

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  /** All whole-word occurrences, sorted by (start, end). Offsets index into
    * the original text (case-folding preserves length).
    *
    * `\b` is evaluated exactly as Python/RE2 on ASCII: a boundary exists at
    * a position iff exactly one of the two adjacent chars is a word char
    * (out-of-bounds counts as non-word). Same-term overlapping hits are
    * suppressed greedily left-to-right, matching `re.finditer`'s
    * non-overlapping scan (reference: text2graph/macrostrat.py:121).
    */
  def findAll(text0: String): Seq[Model.Mention] = {
    val text = norm(text0)
    val hits = mutable.ArrayBuffer.empty[Model.Mention]
    val lastEnd = mutable.LongMap.empty[Int] // termIdx -> last accepted end
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i).toLong
      while (node != 0 && !children(node).contains(c)) node = fail(node)
      node = children(node).getOrElse(c, 0)
      if (outputs(node).nonEmpty) {
        outputs(node).foreach { t =>
          val w = norm(terms(t))
          val start = i - w.length + 1
          val end = i + 1
          val wordAtStart = isWordChar(text.charAt(start))
          val wordBeforeStart = start > 0 && isWordChar(text.charAt(start - 1))
          val wordAtLast = isWordChar(text.charAt(end - 1))
          val wordAfterEnd = end < text.length && isWordChar(text.charAt(end))
          val bounded = (wordAtStart != wordBeforeStart) && (wordAtLast != wordAfterEnd)
          if (bounded && start >= lastEnd.getOrElse(t.toLong, 0)) {
            // In ignore-case mode the reference matches over the LOWERED
            // text, so the reported word is the case-folded form
            // (macrostrat.py:142-144: match.group() of the lowered text).
            hits += Model.Mention(text.substring(start, end), start, end)
            lastEnd(t.toLong) = end
          }
        }
      }
      i += 1
    }
    hits.sortBy(m => (m.start, m.end)).toSeq
  }
}

object MentionScanner {
  // Executor-local automaton cache: one build per (dict identity, case mode)
  // per JVM, shared across tasks (SURVEY B5 executor-singleton pattern).
  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Boolean), MentionScanner]()

  def apply(terms: Array[String], ignoreCase: Boolean): MentionScanner = {
    val key = (java.util.Arrays.hashCode(terms.asInstanceOf[Array[AnyRef]]), ignoreCase)
    cache.computeIfAbsent(key, _ => new MentionScanner(terms, ignoreCase))
  }
}
