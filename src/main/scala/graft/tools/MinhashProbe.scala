package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: cost of the 8-independent-md5 MinHash signature vs a
  * single-md5 window-split family on the sf0.1 corpus. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir).cache()
    docs.count()
    def time(name: String)(f: => Long): Unit =
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        if (i > 0) println(f"[mh] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
      }
    val tok = docs.select(col("doc_id"),
      explode(graft.ops.Dedup.tokens(col("text"))).as("tok"))
    time("8xmd5 ") {
      val aggs = (0 until 8).map(i => min(md5(concat(lit(s"$i|"), col("tok")))).as(s"h$i"))
      tok.groupBy("doc_id").agg(aggs.head, aggs.tail: _*).count()
    }
    time("1xmd5w") {
      val h = md5(col("tok"))
      val aggs = (0 until 8).map(i => min(substring(h, i * 4 + 1, 4)).as(s"h$i"))
      tok.groupBy("doc_id").agg(aggs.head, aggs.tail: _*).count()
    }
    spark.stop()
  }
}
