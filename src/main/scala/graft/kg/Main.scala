package graft.kg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entrypoint for the batch KG-construction job
  * (BASELINE.json north_rule: "the whole job submits via spark-submit").
  *
  *   spark-submit --class graft.kg.Main <jar> \
  *     --pages <parquet dir | "synthetic:<sfDir>"> --out <dir> \
  *     [--partitions N] [--salted] [--no-canonicalize] [--snapshot] \
  *     [--dedup <minJaccard>] [--open-vocabulary] [--buckets lo-hi] \
  *     [--fuzzy <minJaccard> [--fuzzy-cap <df>]] [--cosine <minSim>
  *      [--cosine-lsh planes,bands]] [--no-broadcast-done]
  *
  * Maintenance modes (snapshot stores; run instead of a pipeline pass):
  *     --out <dir> --compact            global CC canonicalization rewrite
  *     --out <dir> --compact-dedup <minJaccard> --pages <src>
  *                                      global cross-shard dedup rewrite
  *                                      (corpus from --pages)
  *     --out <dir> --redrive --pages <src>
  *                                      re-drive the streaming failure log
  *     --out <dir> --rewrite            small-file compaction (file layout
  *                                      only; re-establishes url_bucket=N/)
  *     --out <dir> --expire <keepLast>  retention sweep + orphan cleanup
  *
  * Reruns with the same --out resume incrementally (left-anti join against
  * committed urls). Two sink protocols:
  *  - default: append to a 64-way url-bucketed parquet table + a separate
  *    checkpoint `done` table (the reference's commit shape);
  *  - --snapshot: triples/lineage/done publish in ONE atomic snapshot via
  *    graft.sources.SnapshotStore (Iceberg commit semantics — snapshot
  *    isolation, optimistic concurrency, time travel).
  * --dedup runs the corpus duplicate gate before inference (LSH →
  * verified Jaccard → CC resolution; drops counted in lineage);
  * --open-vocabulary skips the driver small-graph probes (unbounded
  * entity/dedup spaces go straight to distributed CC);
  * --buckets lo-hi (inclusive url-bucket range, 0-63) shards this run:
  * only pages in the shard's buckets process, and the resume anti-join
  * prunes the done-set scan to those bucket directories — a 64-shard
  * fleet covers the corpus with per-shard broadcast resume joins
  * (KgPipeline.Config.buckets scaladoc for the exact scope).
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

    // maintenance modes: operate on an existing snapshot store and exit
    if (opts.contains("compact")) {
      // pass the dim snapshot so rows whose canonical moved are RE-hydrated
      // — without it the compacted table would keep dim columns joined on
      // the pre-compaction name (stale next to the new obj_final)
      val v = graft.streaming.StreamingKg.compactCanonicalize(spark, outDir,
        dims = Some(Dims.snapshot(spark)))
      println(v.map(v => s"[graft] compacted to snapshot v$v at $outDir")
        .getOrElse(s"[graft] nothing to compact at $outDir"))
      spark.stop(); return
    }
    if (opts.contains("compact-dedup")) {
      val corpus =
        (if (pagesSrc.startsWith("synthetic:"))
          Pages.all(spark, pagesSrc.stripPrefix("synthetic:"))
        else spark.read.parquet(pagesSrc))
      // competition must run over the FULL corpus the sharded runs consumed
      // (compactDedup scaladoc) — extract text when the source carries html
      val docs =
        if (corpus.columns.contains("text")) corpus.select("url", "text")
        else corpus.select(col("url"),
          udf((h: Array[Byte]) => HtmlText.extract(h)).apply(col("html")).as("text"))
      val v = graft.streaming.StreamingKg.compactDedup(spark, outDir, docs,
        minJaccard = opts("compact-dedup").toDouble,
        localProbe = !opts.contains("open-vocabulary"))
      println(v.map(v => s"[graft] dedup-compacted to snapshot v$v at $outDir")
        .getOrElse(s"[graft] nothing to compact at $outDir"))
      spark.stop(); return
    }
    if (opts.contains("redrive")) {
      // same bootstrap AND the same alignment-tier flags as a pipeline
      // run: redriveFailed's contract is micro-batch-identical per-page
      // semantics, so a tiered deployment passes its tiers here too —
      // silently re-driving with tier-1-only linking would commit triples
      // whose obj_canonical/obj_linked differ from the stream's
      val (dims, client) = bootstrap(spark)
      val v = graft.streaming.StreamingKg.redriveFailed(
        spark, outDir, loadPages(spark, pagesSrc), dims, client,
        fuzzyMinJaccard = opts.get("fuzzy").map(_.toDouble),
        fuzzyStopGramMaxDf = opts.get("fuzzy-cap").map(_.toInt),
        cosineMinSim = opts.get("cosine").map(_.toDouble),
        cosineLshPrune = opts.get("cosine-lsh").map(parsePair),
        broadcastTarget = !opts.contains("no-broadcast-done"))
      println(v.map(v => s"[graft] re-drive committed snapshot v$v at $outDir")
        .getOrElse(s"[graft] no failure log to re-drive at $outDir"))
      spark.stop(); return
    }
    if (opts.contains("rewrite")) {
      val v = KgPipeline.compactStoreFiles(spark, outDir)
      println(v.map(v => s"[graft] rewrote file layout to snapshot v$v at $outDir")
        .getOrElse(s"[graft] nothing to rewrite at $outDir"))
      spark.stop(); return
    }
    if (opts.contains("expire")) {
      val (m, d) = graft.sources.SnapshotStore.expireSnapshots(
        spark, outDir, keepLast = opts("expire").toInt,
        graceMs = opts.getOrElse("grace-ms", "3600000").toLong)
      println(s"[graft] expired $m manifests, reclaimed $d data files at $outDir")
      spark.stop(); return
    }

    val pages = loadPages(spark, pagesSrc)
    val (dims, client) = bootstrap(spark)

    val cfg = KgPipeline.Config(
      numPartitions = numPartitions,
      saltedAlign = opts.contains("salted"),
      canonicalize = !opts.contains("no-canonicalize"),
      canonLocalProbe = !opts.contains("open-vocabulary"),
      dedupMinJaccard = opts.get("dedup").map(_.toDouble),
      fuzzyAlignMinJaccard = opts.get("fuzzy").map(_.toDouble),
      fuzzyStopGramMaxDf = opts.get("fuzzy-cap").map(_.toInt),
      cosineAlignMinSim = opts.get("cosine").map(_.toDouble),
      cosineAlignLshPrune = opts.get("cosine-lsh").map(parsePair),
      broadcastDone = !opts.contains("no-broadcast-done"),
      buckets = opts.get("buckets").map { r =>
        // anchored regexes, not split: "5-" / "-5" / "a-b" all fall through
        // to the usage error instead of silently sharding to one bucket or
        // throwing a bare NumberFormatException
        val RangeRe = """(\d+)\s*-\s*(\d+)""".r
        val OneRe = """(\d+)""".r
        val (lo, hi) = r.trim match {
          case RangeRe(l, h) => (l.toInt, h.toInt)
          case OneRe(one) => (one.toInt, one.toInt)
          case _ => sys.error(s"--buckets expects lo-hi, got: $r")
        }
        require(lo >= 0 && hi < KgPipeline.UrlBuckets && lo <= hi,
          s"--buckets range must sit in 0-${KgPipeline.UrlBuckets - 1}")
        (lo to hi): Seq[Int]
      })
    if (opts.contains("snapshot")) {
      val v = KgPipeline.runAndCommitSnapshot(spark, pages, dims, client, outDir, cfg)
      println(s"[graft] committed snapshot v$v at $outDir")
    } else KgPipeline.runAndCommit(spark, pages, dims, client, outDir, cfg)
    spark.stop()
  }

  /** Corpus loader shared by the run and maintenance modes. */
  private def loadPages(spark: SparkSession, src: String) =
    if (src.startsWith("synthetic:"))
      Pages.all(spark, src.stripPrefix("synthetic:"))
    else spark.read.parquet(src)

  /** Dim snapshot + default client, built ONCE per process (the run path
    * and --redrive share it; dims persist so the three dictionary collects
    * scan the snapshot plans once). */
  private def bootstrap(spark: SparkSession): (Dims.Snapshot, Inference.InferenceClient) = {
    val dims = Dims.snapshot(spark).persisted()
    val client = Inference.defaultClient(
      dims.stratDim.select("strat_name").collect().map(_.getString(0)),
      dims.gazetteerDim.select("name").collect().map(_.getString(0)),
      dims.mineralDim.select("mineral").collect().map(_.getString(0)))
    (dims, client)
  }

  /** "planes,bands" → (planes, bands), anchored like --buckets. */
  private def parsePair(v: String): (Int, Int) = {
    val PairRe = """(\d+)\s*,\s*(\d+)""".r
    v.trim match {
      case PairRe(p, b) => (p.toInt, b.toInt)
      case _ => sys.error(s"--cosine-lsh expects planes,bands, got: $v")
    }
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
      case "--dedup" :: v :: rest => parse(rest, acc + ("dedup" -> v))
      case "--fuzzy" :: v :: rest => parse(rest, acc + ("fuzzy" -> v))
      case "--fuzzy-cap" :: v :: rest => parse(rest, acc + ("fuzzy-cap" -> v))
      case "--cosine" :: v :: rest => parse(rest, acc + ("cosine" -> v))
      case "--cosine-lsh" :: v :: rest => parse(rest, acc + ("cosine-lsh" -> v))
      case "--no-broadcast-done" :: rest => parse(rest, acc + ("no-broadcast-done" -> "1"))
      case "--open-vocabulary" :: rest => parse(rest, acc + ("open-vocabulary" -> "1"))
      case "--compact" :: rest => parse(rest, acc + ("compact" -> "1"))
      case "--compact-dedup" :: v :: rest => parse(rest, acc + ("compact-dedup" -> v))
      case "--redrive" :: rest => parse(rest, acc + ("redrive" -> "1"))
      case "--rewrite" :: rest => parse(rest, acc + ("rewrite" -> "1"))
      case "--expire" :: v :: rest => parse(rest, acc + ("expire" -> v))
      case "--grace-ms" :: v :: rest => parse(rest, acc + ("grace-ms" -> v))
      case "--buckets" :: v :: rest => parse(rest, acc + ("buckets" -> v))
      case other :: _ => sys.error(s"unknown arg: $other")
    }
}
