package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: regenerate the pinned golden sets for the `kg_rdf_triples`
  * (full literal identity: url, subj, pred, obj, obj_is_literal, lang,
  * datatype) and `kg_rdf_ttl` (per-page Turtle document md5) driver-gate
  * oracles.
  *
  * The RDF materialization runs the full fixture pipeline, which no SQL
  * engine can recompute, so its oracle is a pinned expected set — the same
  * strategy as the reference's golden TTL files
  * (tests/fixtures/test_triplet_to_rdf_*.ttl, compared at
  * tests/test_gkm.py:107-117). The pinned set's *authority* comes from
  * GoldenTtlSpec + RdfSpec + the hand-derived kg_rdf_golden_slice oracle,
  * which assert reference-semantics parity independently; these files
  * freeze the complete output against regression.
  *
  * Regenerate ONLY after an intentional RDF-semantics change, then re-run
  * the golden parity suites:
  *   sbt "runMain graft.tools.GoldenRdf"
  */
object GoldenRdf {
  def main(args: Array[String]): Unit = {
    val triplesOut = args.headOption.getOrElse("src/main/resources/golden/kg_rdf_triples.tsv")
    val ttlOut = args.drop(1).headOption.getOrElse("src/main/resources/golden/kg_rdf_ttl.tsv")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def write(path: String, rows: Seq[Seq[String]]): Unit = {
      val p = java.nio.file.Paths.get(path)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p,
        rows.map(_.mkString("\t")).sortBy(identity)
          .mkString("", "\n", "\n"))
      println(s"wrote ${rows.length} golden rows to $path")
    }
    val triples = graft.KgQueries.queries("kg_rdf_triples")(spark, "")
      .collect()
      .map(r => Seq(r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4).toString, r.getString(5), r.getString(6)))
      .toSeq
    write(triplesOut, triples)
    val ttl = graft.KgQueries.queries("kg_rdf_ttl")(spark, "")
      .collect().map(r => Seq(r.getString(0), r.getString(1))).toSeq
    write(ttlOut, ttl)
    spark.stop()
  }
}
