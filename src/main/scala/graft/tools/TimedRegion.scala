package graft.tools

import org.apache.spark.sql.functions._
import graft._
import graft.kg._

/** Dev main: break down the scaling bench's timed region into actions. */
object TimedRegion {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repl = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPL", "8").toInt
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
      println(f"[timed] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val dims = Dims.snapshot(spark).persisted()
    val stratTerms = (Dims.pinnedStrat.map(_.strat_name) ++ KgQueries.EntTerms ++
      Dims.syntheticStrat(45000).map(_.strat_name)).toArray
    val client = Inference.defaultClient(
      stratTerms,
      Dims.gazetteer.map(_.name).toArray ++ KgQueries.LocTerms,
      Dims.pinnedMinerals.map(_.mineral).toArray)
    client.infer(Seq(Inference.Request("w", "w", "warm spark table join", "en")))
    val alias = Linker.aliasDim(dims).cache(); alias.count()
    val prepared = Hydrator.prepare(dims).cached()
    prepared.stratKeyed.count(); prepared.mineralKeyed.count()
    prepared.gaz.count(); prepared.lithKeyed.count()
    val prompting: Seq[Inference.HandlerDict] = Seq(
      Prompts.StratV3 -> stratTerms,
      Prompts.MineralV0 -> Dims.pinnedMinerals.map(_.mineral).toArray)
    val pages = Bench.scalingPages(spark, sfDir, repl, 12)
    pages.count()

    // ---- timed region, decomposed (mirrors KgPipeline.run stages) ----
    val partitioned = pages.repartition(cores * 2, col("url"))
    val extracted = partitioned
      .withColumn("extracted_text", udf((h: Array[Byte]) => HtmlText.extract(h)).apply(col("html")))
      .withColumn("extract_ok", sha2(col("extracted_text"), 256) === sha2(col("text"), 256))
      .drop("text").withColumnRenamed("extracted_text", "text")
      .withColumn("hashed_text", sha2(col("text"), 256))
    val raw = Inference.run(extracted, client, 200, prompting)
    val parsed = time("extract+infer+parse") {
      val p = PostProcess.triplesDf(raw.toDF())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    val aligned = time("align") {
      val a = Linker.align(parsed, alias)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      a.count(); a
    }
    val canonical = time("canonicalize") { val c = Canonicalizer(aligned); c.count(); c }
    val hydrated = time("hydrate+count") {
      Hydrator.hydratePrepared(canonical, prepared,
        java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
        .select(KgPipeline.TripleColumns.map(col): _*).count()
    }
    spark.stop()
  }
}
