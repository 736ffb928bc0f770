package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong
import java.util.concurrent.atomic.LongAdder

/** Dev main: per declared query, count Spark jobs/stages/tasks and sum
  * task time, so wall clock splits into cluster work vs driver-side
  * overhead (planning, probe collects, broadcast builds, action count).
  * Usage: sbt "runMain graft.tools.QueryJobs q1 q2 ..." (default: all).
  */
object QueryJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val localDir = s"/dev/shm/graft-spark-${sys.props.getOrElse("user.name", "u")}"
    new java.io.File(localDir).mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-queryjobs")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir", localDir)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicLong
    val stages = new AtomicLong
    val tasks = new AtomicLong
    val taskMs = new LongAdder
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet(); taskMs.add(t.taskInfo.duration)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    // warmup pass (uncounted for comparability with Bench's timed pass)
    names.foreach { n =>
      graft.SparkEntry.queries.get(n).foreach { fn =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    }
    println(f"${"query"}%-28s ${"wall_s"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"task_s"}%8s")
    names.foreach { n =>
      graft.SparkEntry.queries.get(n).foreach { fn =>
        // settle listener queue, then snapshot counters
        Thread.sleep(300)
        val (j0, s0, t0, m0) = (jobs.get, stages.get, tasks.get, taskMs.sum())
        val w0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case e: Throwable =>
          println(s"ERROR $n: ${e.getClass.getSimpleName}") }
        val wall = (System.nanoTime() - w0) / 1e9
        Thread.sleep(300)
        println(f"$n%-28s $wall%7.3f ${jobs.get - j0}%5d ${stages.get - s0}%7d ${tasks.get - t0}%6d ${(taskMs.sum() - m0) / 1000.0}%8.2f")
      }
    }
    spark.stop()
  }
}
