package graft.kg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entrypoint for the batch KG-construction job
  * (BASELINE.json north_rule: "the whole job submits via spark-submit").
  *
  *   spark-submit --class graft.kg.Main <jar> \
  *     --pages <parquet dir | "synthetic:<sfDir>"> --out <dir> \
  *     [--partitions N] [--salted] [--no-canonicalize] [--snapshot]
  *
  * Reruns with the same --out resume incrementally (left-anti join against
  * committed urls). Two sink protocols:
  *  - default: append to a 64-way url-bucketed parquet table + a separate
  *    checkpoint `done` table (the reference's commit shape);
  *  - --snapshot: triples/lineage/done publish in ONE atomic snapshot via
  *    graft.sources.SnapshotStore (Iceberg commit semantics — snapshot
  *    isolation, optimistic concurrency, time travel).
  */
object Main {

  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList, Map.empty)
    val pagesSrc = opts.getOrElse("pages", "synthetic:/root/testdata/sf0.001")
    val outDir = opts.getOrElse("out",
      sys.error("--out <dir> is required"))
    val numPartitions = opts.get("partitions").map(_.toInt).getOrElse(32)

    val builder = SparkSession.builder()
      .appName("graft-kg-construct")
      .config("spark.sql.shuffle.partitions", numPartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects spark.master; only default it for bare JVM runs
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master("local[*]")).getOrCreate()

    val pages =
      if (pagesSrc.startsWith("synthetic:"))
        Pages.all(spark, pagesSrc.stripPrefix("synthetic:"))
      else spark.read.parquet(pagesSrc)

    val dims = Dims.snapshot(spark).persisted()
    val client = Inference.defaultClient(
      dims.stratDim.select("strat_name").collect().map(_.getString(0)),
      dims.gazetteerDim.select("name").collect().map(_.getString(0)),
      dims.mineralDim.select("mineral").collect().map(_.getString(0)))

    val cfg = KgPipeline.Config(
      numPartitions = numPartitions,
      saltedAlign = opts.contains("salted"),
      canonicalize = !opts.contains("no-canonicalize"))
    if (opts.contains("snapshot")) {
      val v = KgPipeline.runAndCommitSnapshot(spark, pages, dims, client, outDir, cfg)
      println(s"[graft] committed snapshot v$v at $outDir")
    } else KgPipeline.runAndCommit(spark, pages, dims, client, outDir, cfg)
    spark.stop()
  }

  @annotation.tailrec
  private def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case "--pages" :: v :: rest => parse(rest, acc + ("pages" -> v))
      case "--out" :: v :: rest => parse(rest, acc + ("out" -> v))
      case "--partitions" :: v :: rest => parse(rest, acc + ("partitions" -> v))
      case "--salted" :: rest => parse(rest, acc + ("salted" -> "1"))
      case "--no-canonicalize" :: rest => parse(rest, acc + ("no-canonicalize" -> "1"))
      case "--snapshot" :: rest => parse(rest, acc + ("snapshot" -> "1"))
      case other :: _ => sys.error(s"unknown arg: $other")
    }
}
