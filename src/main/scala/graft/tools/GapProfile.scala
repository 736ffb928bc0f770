package graft.tools

import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

/** Dev main: run the scaling pipeline once and split wall time into
  * cluster task time vs driver-side gaps (scheduling, planning,
  * broadcast builds, local CC). */
object GapProfile {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repl = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPL", "32").toInt

    val taskTime = new LongAdder
    val gcTime = new LongAdder
    val cpuTime = new LongAdder
    val jobs = new AtomicLong
    val stages = new AtomicLong
    var jobWindows = List.empty[(Long, Long)]
    val listener = new SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        taskTime.add(t.taskInfo.duration)
        if (t.taskMetrics != null) {
          gcTime.add(t.taskMetrics.jvmGCTime)
          cpuTime.add(t.taskMetrics.executorCpuTime / 1000000L)
        }
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(j.jobId, System.currentTimeMillis())
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = Option(starts.get(j.jobId)).getOrElse(0L)
        jobWindows ::= (s, System.currentTimeMillis())
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    }

    // mirror Bench.runPipeline but with a listener and explicit wall split
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(listener)

    val dims = graft.kg.Dims.snapshot(spark).persisted()
    val stratTerms = (graft.kg.Dims.pinnedStrat.map(_.strat_name) ++
      graft.KgQueries.EntTerms ++
      graft.kg.Dims.syntheticStrat(45000).map(_.strat_name)).toArray
    val client = graft.kg.Inference.defaultClient(
      stratTerms,
      graft.kg.Dims.gazetteer.map(_.name).toArray ++ graft.KgQueries.LocTerms,
      graft.kg.Dims.pinnedMinerals.map(_.mineral).toArray)
    client.infer(Seq(graft.kg.Inference.Request("w", "w", "warm spark join", "en")))
    val alias = graft.kg.Linker.aliasDim(dims).cache(); alias.count()
    val prepared = graft.kg.Hydrator.prepare(dims).cached()
    prepared.stratKeyed.count(); prepared.mineralKeyed.count()
    prepared.gaz.count(); prepared.lithKeyed.count()
    val promptDicts: Seq[graft.kg.Inference.HandlerDict] = Seq(
      graft.kg.Prompts.StratV3 -> stratTerms,
      graft.kg.Prompts.MineralV0 -> graft.kg.Dims.pinnedMinerals.map(_.mineral).toArray)
    val pages = graft.Bench.scalingPages(spark, sfDir, repl, 24)
    pages.count()

    taskTime.reset(); jobs.set(0); stages.set(0); jobWindows = Nil
    val t0 = System.currentTimeMillis()
    val res = graft.kg.KgPipeline.run(spark, pages, dims, client,
      graft.kg.KgPipeline.Config(numPartitions = cores * 2,
        prebuiltAlias = Some(alias), preparedDims = Some(prepared),
        promptDicts = Some(promptDicts)))
    val n = res.triples.count()
    val wall = System.currentTimeMillis() - t0
    Thread.sleep(500) // let listener drain
    // union job windows to get "time covered by at least one running job"
    val covered = {
      val sorted = jobWindows.sortBy(_._1)
      var tot = 0L; var curS = -1L; var curE = -1L
      sorted.foreach { case (s, e) =>
        if (s > curE) { if (curE > 0) tot += curE - curS; curS = s; curE = e }
        else curE = math.max(curE, e)
      }
      if (curE > 0) tot += curE - curS
      tot
    }
    println(f"[gap] wall=${wall / 1000.0}%.2f s  taskTime=${taskTime.sum / 1000.0}%.2f s " +
      f"(=${taskTime.sum / 1000.0 / cores}%.2f s/core)  gc=${gcTime.sum / 1000.0}%.2f s " +
      f"cpu=${cpuTime.sum / 1000.0}%.2f s  jobs=${jobs.get}  stages=${stages.get}")
    println(f"[gap] job-covered=${covered / 1000.0}%.2f s  uncovered-gaps=${(wall - covered) / 1000.0}%.2f s  triples=$n")
    spark.stop()
  }
}
