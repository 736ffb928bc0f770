package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: print the executed-plan join strategies of the hinted vs
  * AQE-managed hydration paths (PLANS.md round-3 note). */
object HydratePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.kg._
    val dims = Dims.snapshot(spark).persisted() // full 45k-row dictionary scale
    val prepared = Hydrator.prepare(dims).cached()
    val triples = Dims.pinnedStrat.map(_.strat_name)
      .map(n => ("u", "h", "m", "Minnesota", "contains", n, "strat"))
      .toDF("url", "hashed_text", "model_id", "subj_name", "predicate", "obj_name", "obj_kind")
    val canonical = Canonicalizer(Linker.align(triples, Linker.aliasDim(dims)))
    val ts = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    for ((label, bcast) <- Seq("hinted" -> true, "aqe" -> false)) {
      val df = Hydrator.hydratePrepared(canonical, prepared, ts, broadcastDims = bcast)
      df.count() // let AQE finalize the plan
      val plan = df.queryExecution.executedPlan.toString
      val joins = plan.linesIterator.map(_.trim)
        .filter(l => l.contains("Join") && !l.contains("ReusedExchange"))
        .map(_.takeWhile(_ != '[')).toSeq
      println(s"== $label ==")
      joins.foreach(j => println("  " + j))
    }
    spark.stop()
  }
}
