package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: probe whether corpus canonicalization changes any fixture
  * page's TTL document — the premise that lets kg_search_to_graph_slow
  * (canonicalize=false, the reference's per-paragraph slow-path
  * semantics) share kg_search_to_graph's oracle. Prints the differing
  * page set (expected empty; the KgPipelineSpec premise test pins it). */
object CanonProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.kg._
    val dims = Dims.tiny(spark).persisted()
    val client = Inference.pinnedClient
    def ttl(canon: Boolean) = {
      val res = KgPipeline.run(spark, Pages.fixtures(spark), dims, client,
        KgPipeline.Config(numPartitions = 4, emitRdf = true, canonicalize = canon))
      Rdf.toTtl(res.rdf.get).select(col("url"), md5(col("ttl")).as("m"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    }
    val on = ttl(true); val off = ttl(false)
    println(s"pages on=${on.size} off=${off.size}")
    val diff = (on.keySet ++ off.keySet).filter(k => on.get(k) != off.get(k))
    println(s"differing pages: ${diff.size} ${diff.mkString(", ")}")
    spark.stop()
  }
}
