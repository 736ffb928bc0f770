package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full KG-construction pipeline (extract → infer → parse →
    * align → canonicalize → hydrate) over reference-fixture pages plus the
    * sf0.001 synthetic corpus; returns the triples table. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.kg._
    val dims = Dims.tiny(spark)
    val client = Inference.defaultClient(
      Dims.pinnedStrat.map(_.strat_name).toArray,
      Dims.gazetteer.map(_.name).toArray ++ KgQueries.LocTerms,
      Dims.pinnedMinerals.map(_.mineral).toArray ++ Chem.UsgsFormulas.keys)
    val pages = Pages.all(spark, "/root/testdata/sf0.001")
    KgPipeline.run(spark, pages, dims, client,
      KgPipeline.Config(numPartitions = 8)).triples
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.allOracles
}
