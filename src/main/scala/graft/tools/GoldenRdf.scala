package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: regenerate the pinned golden triple set for the
  * `kg_rdf_triples` driver-gate oracle.
  *
  * The RDF materialization runs the full fixture pipeline, which no SQL
  * engine can recompute, so its oracle is a pinned expected set — the same
  * strategy as the reference's golden TTL files
  * (tests/fixtures/test_triplet_to_rdf_*.ttl, compared at
  * tests/test_gkm.py:107-117). The pinned set's *authority* comes from
  * GoldenTtlSpec + RdfSpec, which assert reference-fixture parity on the
  * graph atoms; this file freezes the complete output against regression.
  *
  * Regenerate ONLY after an intentional RDF-semantics change, then re-run
  * the golden parity suites:
  *   sbt "runMain graft.tools.GoldenRdf src/main/resources/golden/kg_rdf_triples.tsv"
  */
object GoldenRdf {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/main/resources/golden/kg_rdf_triples.tsv")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.KgQueries.queries("kg_rdf_triples")(spark, "")
      .collect()
      .map(r => Seq(r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_.mkString(""))
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p,
      rows.map(_.mkString("\t")).mkString("", "\n", "\n"))
    println(s"wrote ${rows.length} golden rows to $out")
    spark.stop()
  }
}
