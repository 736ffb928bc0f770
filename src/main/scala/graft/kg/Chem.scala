package graft.kg

/** Chemical-formula parsing + USGS critical-minerals constants
  * (SURVEY.md P7/P8).
  */
object Chem {

  /** The 118 element symbols (reference: text2graph/schema.py:159-277 —
    * `Element` enum; standard periodic table, public knowledge). */
  val ElementSymbols: Set[String] = Set(
    "H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne", "Na", "Mg", "Al",
    "Si", "P", "S", "Cl", "Ar", "K", "Ca", "Sc", "Ti", "V", "Cr", "Mn",
    "Fe", "Co", "Ni", "Cu", "Zn", "Ga", "Ge", "As", "Se", "Br", "Kr", "Rb",
    "Sr", "Y", "Zr", "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd", "In",
    "Sn", "Sb", "Te", "I", "Xe", "Cs", "Ba", "La", "Ce", "Pr", "Nd", "Pm",
    "Sm", "Eu", "Gd", "Tb", "Dy", "Ho", "Er", "Tm", "Yb", "Lu", "Hf", "Ta",
    "W", "Re", "Os", "Ir", "Pt", "Au", "Hg", "Tl", "Pb", "Bi", "Po", "At",
    "Rn", "Fr", "Ra", "Ac", "Th", "Pa", "U", "Np", "Pu", "Am", "Cm", "Bk",
    "Cf", "Es", "Fm", "Md", "No", "Lr", "Rf", "Db", "Sg", "Bh", "Hs", "Mt",
    "Ds", "Rg", "Cn", "Nh", "Fl", "Mc", "Lv", "Ts", "Og")

  /** Formula → sorted distinct valid element symbols.
    * Exact scan semantics of the reference (text2graph/schema.py:301-337):
    * at an uppercase char, take a 2-char symbol iff the next char is in the
    * legal-suffix set, else 1-char; skip everything else; dedupe; sort
    * lexicographically; drop candidates not in the element enum.
    */
  private val LegalSuffix = "abcdefghiklmnoprstuvy".toSet

  def toElements(formula: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < formula.length) {
      val c = formula.charAt(i)
      if (c.isUpper) {
        if (i + 1 < formula.length && LegalSuffix.contains(formula.charAt(i + 1))) {
          out += formula.substring(i, i + 2); i += 2
        } else { out += c.toString; i += 1 }
      } else i += 1
    }
    out.distinct.sorted.filter(ElementSymbols.contains).toSeq
  }

  /** reference: text2graph/usgs.py:1-52 — 50 USGS critical minerals. */
  val CriticalMinerals: Seq[String] = Seq(
    "aluminium", "antimony", "arsenic", "barite", "beryllium", "bismuth",
    "cerium", "cesium", "chromium", "cobalt", "dysprosium", "erbium",
    "europium", "fluorspar", "gadolinium", "gallium", "germanium",
    "graphite", "hafnium", "holmium", "indium", "iridium", "lanthanum",
    "lithium", "lutetium", "magnesium", "manganese", "neodymium", "nickel",
    "niobium", "palladium", "platinum", "praseodymium", "rhodium",
    "rubidium", "ruthenium", "samarium", "scandium", "tantalum",
    "tellurium", "terbium", "thulium", "tin", "titanium", "tungsten",
    "vanadium", "ytterbium", "yttrium", "zinc", "zirconium")

  /** reference: text2graph/usgs.py:55-80 — minerals absent from the
    * Macrostrat mineral dim; name (lowercase) → formula fallback. */
  val UsgsFormulas: Map[String, String] = Map(
    "barite" -> "BaSO4", "fluorspar" -> "CaF2", "beryllium" -> "Be",
    "cesium" -> "Cs", "dysprosium" -> "Dy", "erbium" -> "Er",
    "europium" -> "Eu", "gadolinium" -> "Gd", "gallium" -> "Ga",
    "germanium" -> "Ge", "hafnium" -> "Hf", "holmium" -> "Ho",
    "lanthanum" -> "La", "lithium" -> "Li", "lutetium" -> "Lu",
    "neodymium" -> "Nd", "praseodymium" -> "Pr", "rubidium" -> "Rb",
    "samarium" -> "Sm", "scandium" -> "Sc", "terbium" -> "Tb",
    "thulium" -> "Tm", "yttrium" -> "Y", "zirconium" -> "Zr")
}
