package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesis of the mandated input table
  * `(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)`
  * (BASELINE.json input_hint) — deterministic, no external data.
  *
  * Two generators:
  *  - [[fromDocuments]]: wraps the driver's synthetic `documents` corpus into
  *    canonical HTML pages (bulk rows for throughput/scale tests),
  *  - [[fixtures]]: the reference's own test paragraphs (golden-parity rows).
  *
  * `html` is rendered with [[HtmlText.render]], so the pipeline's
  * extract-stage invariant extract(html) == text holds byte-for-byte
  * (SURVEY.md §7.2 step 1).
  */
object Pages {

  val UrlPrefix = "https://synthetic.graft/doc/"

  private val renderUdf =
    udf((text: String, lang: String) => HtmlText.render(text, lang))

  /** Bulk pages from the driver's documents table. warc_ts is a fixed epoch
    * plus doc_id seconds — deterministic, never wall-clock. */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.documents(spark, sfDir).select(
      concat(lit(UrlPrefix), col("doc_id")).as("url"),
      timestamp_seconds(lit(1704067200L) + col("doc_id")).as("warc_ts"),
      renderUdf(col("text"), col("lang")).as("html"),
      col("text"),
      col("lang"))

  /** Reference fixture paragraphs as pages. */
  def fixtures(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Fixtures.FixturePages.zipWithIndex.map { case ((url, text, lang, _), i) =>
      (url, java.sql.Timestamp.valueOf(s"2024-01-01 00:00:0$i"),
        HtmlText.render(text, lang), text, lang)
    }.toDF("url", "warc_ts", "html", "text", "lang")
  }

  /** Fixtures + bulk — the standard test/bench input. */
  def all(spark: SparkSession, sfDir: String): DataFrame =
    fixtures(spark).unionByName(fromDocuments(spark, sfDir))
}
