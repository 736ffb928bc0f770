package graft.tools

import org.apache.spark.sql.functions._
import graft._
import graft.ops._

/** Dev main (round 7): decompose dedup_resolve's wall time into its
  * pipeline stages — candidates, verification, symmetric-edge distinct,
  * CC probe — to see which stage the optimization budget should go to. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[timed] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 500)
    // warmup pass (JIT/codegen), discarded
    Dedup.dedupe(docs, 0.8).count()
    for (_ <- 0 until 2) {
      time("candidates.count") { Dedup.minhashCandidates(docs).count() }
      time("jaccard(cands).count") {
        Dedup.jaccard(docs, Dedup.minhashCandidates(docs), 0.8).count()
      }
      time("resolve full (dedupe)") { Dedup.dedupe(docs, 0.8).count() }
      time("resolve distributed") { Dedup.dedupe(docs, 0.8, localProbe = false).count() }
    }
    spark.stop()
  }
}
