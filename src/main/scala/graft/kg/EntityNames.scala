package graft.kg

/** URI-safe entity-name formatters (SURVEY.md P6).
  *
  * `entityName` reproduces the reference byte-for-byte
  * (reference: text2graph/gkm/features/general.py:8-16):
  * strip → Python `str.title()` → remove spaces → any non-[A-Za-z0-9] → "-".
  *
  * Python `str.title()` uppercases a cased char that follows any non-cased
  * char (so "o'brien" → "O'Brien", "abc1def" → "Abc1Def") — Spark's
  * `initcap` only splits on whitespace, hence this custom implementation
  * (SURVEY.md §7.4 byte-parity trap). ASCII-scoped: letters are the only
  * cased chars we handle, matching the dictionary content.
  */
object EntityNames {

  /** Python str.title() over ASCII: capitalize letters that follow a
    * non-letter, lowercase the rest. */
  def pyTitle(s: String): String = {
    val b = new StringBuilder(s.length)
    var prevCased = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val isCased = Character.isLetter(c)
      if (isCased && !prevCased) b.append(Character.toUpperCase(c))
      else if (isCased) b.append(Character.toLowerCase(c))
      else b.append(c)
      prevCased = isCased
      i += 1
    }
    b.toString
  }

  /** reference: text2graph/gkm/features/general.py:8-16 */
  def entityName(s: String): String = {
    val t = pyTitle(s.trim).replace(" ", "")
    t.map(c => if (c.isLetterOrDigit && c < 128) c else '-')
  }

  /** reference: text2graph/gkm/features/stratigraphy.py:64-65 —
    * interval names keep non-alnum chars except double quotes. */
  def intervalName(s: String): String =
    pyTitle(s.trim).replace(" ", "").replace("\"", "")
}
