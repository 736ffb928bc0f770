package graft.kg

/** Reference test fixtures, transcribed for golden-parity tests
  * (reference: tests/conftest.py:17-24; FIXTURES.md §1-2).
  * These anchor the P/R >= 0.95 correctness target of BASELINE.json.
  */
object Fixtures {

  /** The Sauk/Shakopee paragraph (reference: tests/conftest.py:17-19). */
  val SaukText: String =
    "The top of the Sauk megasequence in Minnesota is at the unconformable contact of the Shakopee Formation with the St. Peter Sandstone. Younger rocks are present beneath the St. Peter Sandstone on the southern and east- ern flanks of the Ozark dome, where the upper Sauk succession includes the Roubidoux, Jefferson City, Cotter, Powell – Smithville – Black Rock, and Everton units in that stratigraphic order (Ethington et al., 2012; Palmer et al., 2012). The Shakopee Formation is equivalent to some lower part of this succession, but sparse inverte- brate faunas and long-ranging conodonts in these units preclude correlation with high resolution. The Jasper Member of the Everton Formation of northern Arkansas contains conodonts of the Histiodella holodentata Biozone, which demonstrates the latest early Whiterockian age for the top of the rocks of the GACB in that region. No faunal evidence is available there for the age of the base of the St. Peter Sandstone. The boundary between the Sauk and Tippecanoe megasequences may be a cor- relative conformity in the Reelfoot rift of southeastern Missouri and northeastern Missouri, but this has not been demonstrated arkose. Gallium is found in Minnesota."

  /** Recorded model output for [[SaukText]]
    * (reference: tests/conftest.py:22-24 — the `raw_llm_output` fixture). */
  val SaukRawOutput: String =
    """{"triplets": [
  {"location": "Minnesota", "relationship": "unconformable contact", "stratigraphic_name": "Shakopee Formation"},
  {"location": "southern and eastern flanks of the Ozark dome", "relationship": "includes", "stratigraphic_name": "Roubidoux"},
  {"location": "southern and eastern flanks of the Ozark dome", "relationship": "includes", "stratigraphic_name": "Jefferson City"},
  {"location": "southern and eastern flanks of the Ozark dome", "relationship": "includes", "stratigraphic_name": "Cotter"},
  {"location": "southern and eastern flanks of the Ozark dome", "relationship": "includes", "stratigraphic_name": "Powell"},
  {"location": "southern and eastern flanks of the Ozark dome", "relationship": "includes", "stratigraphic_name": "Smithville"},
  {"location": "southern and eastern flanks of the Ozark dome", "relationship": "includes", "stratigraphic_name": "Black Rock"},
  {"location": "southern and eastern flanks of the Ozark dome", "relationship": "includes", "stratigraphic_name": "Everton"},
  {"location": "northern Arkansas", "relationship": "contains", "stratigraphic_name": "Jasper Member"},
  {"location": "Reelfoot rift of southeastern Missouri and northeastern Missouri", "relationship": "may be a correlative conformity", "stratigraphic_name": "Sauk"}
]}"""

  /** Golden (subj, pred, obj) set decoded from [[SaukRawOutput]]. */
  val SaukGoldenTriples: Set[(String, String, String)] = Set(
    ("Minnesota", "unconformable contact", "Shakopee Formation"),
    ("southern and eastern flanks of the Ozark dome", "includes", "Roubidoux"),
    ("southern and eastern flanks of the Ozark dome", "includes", "Jefferson City"),
    ("southern and eastern flanks of the Ozark dome", "includes", "Cotter"),
    ("southern and eastern flanks of the Ozark dome", "includes", "Powell"),
    ("southern and eastern flanks of the Ozark dome", "includes", "Smithville"),
    ("southern and eastern flanks of the Ozark dome", "includes", "Black Rock"),
    ("southern and eastern flanks of the Ozark dome", "includes", "Everton"),
    ("northern Arkansas", "contains", "Jasper Member"),
    ("Reelfoot rift of southeastern Missouri and northeastern Missouri", "may be a correlative conformity", "Sauk"))

  /** Mineral-pipeline fixture texts (reference: tests/test_llm.py:86,107). */
  val ShakopeeText = "Shakopee formation is in Minnesota."
  val GoldText = "There are plenty of 24k gold is in Minnesota."

  /** Recorded mineral output for [[GoldText]] — shape per the mineral prompt
    * keys (reference: text2graph/prompt.py:125-138). */
  val GoldRawOutput: String =
    """{"triplets": [{"location": "Minnesota", "relationship": "is found in", "mineral_name": "gold"}]}"""

  /** Malformed raw outputs the lenient parser must survive
    * (reference: text2graph/llm.py:211-213, 222-228;
    * chtc/preprocess_extraction_direct.py:173-175). */
  val BareListOutput: String =
    """[{"location": "Minnesota", "relationship": "contains", "stratigraphic_name": "Shakopee Formation"}]"""
  val TrailingGarbageOutput: String =
    """{"triplets": [{"location": "Minnesota", "relationship": "contains", "stratigraphic_name": "Shakopee Formation"}]} I hope this helps!"""
  val InvalidRowOutput: String =
    """{"triplets": [{"location": "Minnesota", "relationship": "contains", "stratigraphic_name": "Shakopee Formation"}, {"relationship": "orphan"}, "not-an-object"]}"""

  /** Deterministic fixture pages: (url, text, lang, recorded raw | null). */
  val FixturePages: Seq[(String, String, String, String)] = Seq(
    ("https://fixtures.graft/sauk", SaukText, "en", SaukRawOutput),
    ("https://fixtures.graft/shakopee", ShakopeeText, "en", null),
    ("https://fixtures.graft/gold", GoldText, "en", GoldRawOutput),
    ("https://fixtures.graft/bare-list", "Bare list fixture.", "en", BareListOutput),
    ("https://fixtures.graft/trailing", "Trailing garbage fixture.", "en", TrailingGarbageOutput),
    ("https://fixtures.graft/invalid-row", "Invalid row fixture.", "en", InvalidRowOutput))
}
