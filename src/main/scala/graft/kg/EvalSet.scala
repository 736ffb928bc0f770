package graft.kg

/** The reference's own micro evaluation artifact, transcribed.
  *
  * `/root/reference/data/testset_micro.parquet.gzip` holds 30 rows of
  * (formation_name, paper_id, paragraph) — a deterministic sample of the
  * project's formation eval set, used by the reference's geo-entity
  * experiments (notebooks/devs/location_and_geo_entities.ipynb). The rows
  * live here as an ASCII-escaped JSON-lines resource written once by
  * `tools/transcribe_eval.py` — a byte-exact transcription of the public
  * DATA (paragraph bytes preserved through JSON escaping), no reformatting.
  *
  * The recall gate (`kg_eval_recall`) runs the full extraction pipeline
  * over these REAL paragraphs — unicode punctuation, mid-word soft
  * hyphens, column-layout line breaks, all the mess the synthetic corpus
  * lacks — and checks each row's formation_name against the hand-derived
  * achievable bound of the deterministic extractor.
  */
object EvalSet {

  final case class EvalRow(formationName: String, paperId: String,
      paragraph: String)

  /** All 30 rows, in the artifact's row order. */
  lazy val testsetMicro: Seq[EvalRow] = {
    val in = getClass.getResourceAsStream("/eval/testset_micro.jsonl")
    require(in != null, "missing resource /eval/testset_micro.jsonl — " +
      "regenerate with tools/transcribe_eval.py")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val n = PostProcess.mapper.readTree(line)
      EvalRow(n.get("formation_name").asText, n.get("paper_id").asText,
        n.get("paragraph").asText)
    }.toVector
    finally src.close()
  }
}
