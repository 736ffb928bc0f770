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
    spark.stop()
  }
}
