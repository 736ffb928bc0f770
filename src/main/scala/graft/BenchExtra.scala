package graft

import org.apache.spark.sql.SparkSession

/** Round-7 optimization harness (guide §1.4): per-query timing with
  * repeats plus noop-sink isolation, and formatted-plan dumps, WITHOUT
  * touching the frozen graft.Bench measurement contract.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra time q1 q2 ..."   — warmup + R timed
  *       runs per query; prints min/median of both count() (the Bench
  *       action) and a noop sink (isolates compute from the count prune).
  *   sbt "runMain graft.BenchExtra explain OUTDIR SUFFIX q1 q2 ..." —
  *       writes OUTDIR/<query>_<SUFFIX>.txt with explain("formatted").
  *
  * Session config mirrors graft.Bench.newSession exactly so numbers and
  * plans are comparable with the graded bench.
  */
object BenchExtra {

  private def newSession(cores: Int): SparkSession = {
    val localDir = s"/dev/shm/graft-spark-${sys.props.getOrElse("user.name", "u")}"
    new java.io.File(localDir).mkdirs()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.local.dir", localDir)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPEATS", "3").toInt
    val mode = args.headOption.getOrElse("time")
    val spark = newSession(cpus)

    mode match {
      case "explain" =>
        val outDir = args(1)
        val suffix = args(2)
        val names =
          if (args.length > 3) args.drop(3).toSeq
          else SparkEntry.queries.keys.toSeq.sorted
        new java.io.File(outDir).mkdirs()
        names.foreach { name =>
          SparkEntry.queries.get(name).foreach { fn =>
            try {
              val plan = fn(spark, sfDir).queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
              java.nio.file.Files.write(
                java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
                plan.getBytes("UTF-8"))
              println(s"wrote $outDir/${name}_$suffix.txt")
            } catch { case e: Throwable =>
              println(s"ERROR $name: ${e.getClass.getSimpleName} ${e.getMessage}") }
          }
        }

      case _ => // time
        val names =
          if (args.length > 1) args.drop(1).toSeq
          else SparkEntry.queries.keys.toSeq.sorted
        val cal0 = Bench.calibrate()
        println(f"calibration_single=$cal0%.3f")
        val rows = names.flatMap { name =>
          SparkEntry.queries.get(name).map { fn =>
            spark.sparkContext.setJobDescription(s"warmup:$name")
            try fn(spark, sfDir).count() catch { case _: Throwable => () }
            def timed(action: String): Seq[Double] = (0 until repeats).map { i =>
              spark.sparkContext.setJobDescription(s"$action:$name#$i")
              val t0 = System.nanoTime()
              try {
                val df = fn(spark, sfDir)
                if (action == "noop")
                  df.write.format("noop").mode("overwrite").save()
                else df.count()
                (System.nanoTime() - t0) / 1e9
              } catch { case e: Throwable =>
                println(s"ERROR $name: ${e.getClass.getSimpleName}"); -1.0 }
            }
            val counts = timed("count")
            val noops = timed("noop")
            def fmt(xs: Seq[Double]) = {
              val ok = xs.filter(_ >= 0).sorted
              if (ok.isEmpty) "err"
              else f"min=${ok.head}%.3f med=${ok(ok.size / 2)}%.3f"
            }
            val line = f"$name%-28s count[${fmt(counts)}]  noop[${fmt(noops)}]"
            println(line)
            line
          }
        }
        val cal1 = Bench.calibrate()
        println(f"calibration_single_end=$cal1%.3f")
        println("== summary ==")
        rows.foreach(println)
    }
    spark.stop()
  }
}
