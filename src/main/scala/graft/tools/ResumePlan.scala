package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: print the executed-plan join strategy of the resume anti-join
  * in both `broadcastDone` modes at a configurable done-set size
  * (PLANS.md round-4 note). args: [nDone] (default 100000). */
object ResumePlan {
  def main(args: Array[String]): Unit = {
    val nDone = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("resumeplan").toString
    spark.range(nDone)
      .select(concat(lit("https://synthetic.graft/doc/"), col("id")).as("url"))
      .write.parquet(s"$dir/done")
    val pages = spark.range(nDone * 2)
      .select(concat(lit("https://synthetic.graft/doc/"), col("id")).as("url"),
        sha2(col("id").cast("string"), 256).as("payload"))
    val done = spark.read.parquet(s"$dir/done").select("url")
    for ((label, hinted) <- Seq("hinted" -> true, "aqe" -> false)) {
      val side = if (hinted) broadcast(done) else done
      val df = pages.join(side, Seq("url"), "left_anti")
      df.count() // let AQE finalize
      val plan = df.queryExecution.executedPlan.toString
      val joins = plan.linesIterator.map(_.trim)
        .filter(l => l.contains("Join") && !l.contains("ReusedExchange"))
        .map(_.takeWhile(_ != '[')).toSeq
      println(s"== $label (done=$nDone) ==")
      joins.foreach(j => println("  " + j))
    }
    // Bucket-sharded resume (PLANS.md round-5): the done-set written
    // url_bucket-partitioned, a 4-bucket shard read back — the url_bucket
    // predicate must appear as a PartitionFilter on the scan (directory
    // pruning: ~4/64ths of the done-set read) and the shard's anti-join
    // must stay a broadcast with no exchange of the page side.
    spark.range(nDone)
      .select(concat(lit("https://synthetic.graft/doc/"), col("id")).as("url"))
      .withColumn("url_bucket", graft.kg.KgPipeline.urlBucket(col("url")))
      .write.partitionBy("url_bucket").parquet(s"$dir/done_bucketed")
    val shard = (0L until 4L)
    val doneB = spark.read.parquet(s"$dir/done_bucketed")
      .filter(col("url_bucket").isin(shard: _*)).select("url")
    val pagesB = pages.filter(graft.kg.KgPipeline.urlBucket(col("url")).isin(shard: _*))
    for ((label, side) <- Seq("hinted" -> broadcast(doneB), "aqe" -> doneB)) {
      val dfB = pagesB.join(side, Seq("url"), "left_anti")
      // execute THIS dataset's own QueryExecution (collect reuses it), so
      // the printed plan is the AQE-final one, not the pre-execution
      // initial plan (bounded: the shard's undone urls, nDone/16 rows)
      dfB.collect()
      val planB = dfB.queryExecution.executedPlan.toString
      // AQE plan strings append an "== Initial Plan ==" section — keep only
      // the final plan above it
      val finalPart = planB.split("== Initial Plan ==").head
      println(s"== bucket-sharded $label (done=$nDone, shard=4/64 buckets) ==")
      println("  isFinalPlan=" + finalPart.linesIterator.next().contains("isFinalPlan=true"))
      finalPart.linesIterator.map(_.trim)
        .filter(l => ((l.contains("Join") || l.contains("Exchange") ||
          l.contains("ShuffleRead")) && !l.contains("ReusedExchange")) ||
          l.contains("PartitionFilters"))
        .foreach { l =>
          val pf = l.indexOf("PartitionFilters")
          println("  " + (if (pf > 0) "FileScan ... " + l.substring(pf)
            else l.takeWhile(_ != '[')))
        }
    }
    spark.stop()
  }
}
