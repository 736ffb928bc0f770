package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg._

/** Dev main: measure the alignment join under a head-skewed key
  * distribution (SURVEY.md §4 "Minnesota problem") across four physical
  * strategies, and record which one a 10^12-page job should pick when the
  * alias dictionary outgrows broadcast:
  *
  *   1. broadcast hash join       — immune to probe-side skew (baseline)
  *   2. shuffle-hash, unsalted    — the anti-pattern: one reducer owns the
  *                                  hot key's entire probe side
  *   3. shuffle-hash, salted      — Linker.alignSalted: probe key salted S
  *                                  ways, build side replicated S times
  *   4. sort-merge + AQE skewJoin — Spark's built-in runtime skew split
  *
  * Prints per-strategy wall time + the relevant plan fragment; results are
  * recorded in PLANS.md. Output equality across strategies is asserted.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val rows = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "4000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffles
      .config("spark.local.dir", "/dev/shm/graft-skew")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // head-skewed probe: 60% of all rows hit ONE key ("Minnesota"), the
    // rest spread uniformly over a 50k-name tail — the distribution a
    // gazetteer-style subject column shows on real web text.
    val probe = spark.range(rows).select(
      concat(lit("https://u/"), col("id")).as("url"),
      lit("h").as("hashed_text"), lit("m").as("model_id"),
      lit("x").as("subj_name"), lit("contains").as("predicate"),
      when(pmod(col("id"), lit(10)) < 6, lit("Minnesota"))
        .otherwise(concat(lit("name-"), pmod(col("id"), lit(50000)))).as("obj_name"),
      lit("strat").as("obj_kind"))
      .repartition(cores * 2, col("url"))
      .persist()
    probe.count()

    import spark.implicits._
    val alias = spark.range(50000).select(
      concat(lit("name-"), col("id")).as("alias_norm"),
      concat(lit("Canon-"), col("id")).as("canonical"),
      lit("strat").as("kind"))
      .unionAll(Seq(("minnesota", "Minnesota (state)", "strat"))
        .toDF("alias_norm", "canonical", "kind"))
      .persist()
    alias.count()

    def time(name: String)(df: => DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[skew] $name%-28s $secs%7.2f s  ($n rows)")
      (n, secs)
    }

    // 1. broadcast (what Linker.align does by default)
    val (n1, _) = time("broadcast") {
      Linker.align(probe, alias)
    }
    // 2. unsalted shuffle-hash — the hot-key anti-pattern
    val (n2, _) = time("shuffle-hash unsalted") {
      val a = alias.withColumnRenamed("kind", "alias_kind")
      probe.withColumn("obj_norm", Linker.normName(col("obj_name")))
        .hint("shuffle_hash")
        .join(a, col("obj_norm") === a("alias_norm") &&
          col("obj_kind") === a("alias_kind"), "left")
        .withColumn("obj_canonical", coalesce(col("canonical"), col("obj_name")))
        .withColumn("obj_linked", col("canonical").isNotNull)
        .drop("alias_norm", "canonical", "alias_kind", "obj_norm")
    }
    // 3. salted shuffle-hash (Linker.alignSalted)
    val (n3, _) = time("shuffle-hash salted x16") {
      Linker.alignSalted(probe, alias, saltBuckets = 16)
    }
    // 4. sort-merge with AQE skew-join split
    val (n4, _) = time("sort-merge + AQE skewJoin") {
      val a = alias.withColumnRenamed("kind", "alias_kind")
      probe.withColumn("obj_norm", Linker.normName(col("obj_name")))
        .hint("merge")
        .join(a, col("obj_norm") === a("alias_norm") &&
          col("obj_kind") === a("alias_kind"), "left")
        .withColumn("obj_canonical", coalesce(col("canonical"), col("obj_name")))
        .withColumn("obj_linked", col("canonical").isNotNull)
        .drop("alias_norm", "canonical", "alias_kind", "obj_norm")
    }
    require(n1 == n2 && n2 == n3 && n3 == n4,
      s"strategy outputs diverge: $n1 $n2 $n3 $n4")

    // plan fragments for PLANS.md (materialize first so AQE has resolved
    // the final physical plan)
    val salted = Linker.alignSalted(probe, alias, saltBuckets = 16)
    salted.count()
    println("[skew] salted plan:")
    println(salted.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("hashpartitioning"))
      .map(l => "  " + l.trim.take(160)).mkString("\n"))
    spark.stop()
  }
}
