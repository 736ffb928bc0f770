package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end KG construction (BASELINE.json north_rule; SURVEY.md §3.3):
  *
  *   pages → repartition(hash(url)) → resume anti-join → html→text extract
  *   → batched inference (mapPartitions) → lenient parse/explode
  *   → alignment join (broadcast | salted) → connected-components
  *   canonicalization → hydration joins → triples table
  *   [+ RDF materialization] + per-partition lineage/metrics rows.
  *
  * Scale posture (designed for 10^12 pages / 1000 executors, tested at
  * local[N]):
  *  - one explicit url-hash repartition up front; every later stage either
  *    preserves partitioning (narrow) or shuffles on aggregation keys,
  *  - all enrichment joins broadcast dictionary-sized dims — zero shuffle
  *    of the page-cardinality side,
  *  - resume is a left_anti join against the checkpoint table (SURVEY J1):
  *    re-running after failure processes only missing urls, and because
  *    every stage is deterministic the union of runs equals one clean run,
  *  - lineage/metrics are per-partition rows computed from
  *    spark_partition_id() — no driver-side collections of data rows.
  */
object KgPipeline {

  /** Url-hash bucket count shared by the triples sink, the done-set layout
    * and the bucket-sharded resume mode (the parquet stand-in for an
    * Iceberg `bucket(url)` partition transform). */
  val UrlBuckets = 64

  /** The bucket of a url — MUST match the sink partitioning everywhere. */
  def urlBucket(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(url), lit(UrlBuckets))

  final case class Config(
      numPartitions: Int = 32,
      microBatch: Int = 200,
      saltedAlign: Boolean = false,
      saltBuckets: Int = 16,
      // Some(minJaccard) => tier-2 fuzzy alignment (Linker.alignFuzzy):
      // names tier-1 leaves unlinked get a char-3-gram Jaccard argmax
      // against the dictionary — the deterministic stand-in for the
      // reference's sub-normalization embedding matches
      // (alignment.py:110-119). Off by default: it links strictly more
      // than normalization equality, so turning it on changes outputs.
      fuzzyAlignMinJaccard: Option[Double] = None,
      // Some(cap) => drop dictionary grams with document frequency > cap
      // from tier-2 candidate generation (Linker.alignFuzzy stop-gram
      // lever; scoring stays exact). Only read when fuzzyAlignMinJaccard
      // is set.
      fuzzyStopGramMaxDf: Option[Int] = None,
      // Some(minSim) => tier-3 cosine alignment (Linker.alignCosine): names
      // still unlinked after the earlier tiers get the reference's own kNN
      // geometry — argmax cosine against the broadcast known-entity
      // embedding matrix, swap iff sim >= minSim (alignment.py:110-119,
      // under the deterministic hashed-gram embedding). Off by default for
      // the same reason as the fuzzy tier.
      cosineAlignMinSim: Option[Double] = None,
      // Some((planes, bands)) => tier-3 scores only hyperplane-LSH
      // candidates instead of the full dictionary matrix (Linker
      // .cosineLshCandidates) — the lever for a dictionary past broadcast
      // size. Approximate (recall-only; emitted sims stay exact), so off
      // by default; trade measured in tools/CosinePrune. Only read when
      // cosineAlignMinSim is set.
      cosineAlignLshPrune: Option[(Int, Int)] = None,
      canonicalize: Boolean = true,
      // false => entity space is known-unbounded (open-vocabulary web
      // extraction): go straight to distributed CC, skip the driver probe.
      canonLocalProbe: Boolean = true,
      // Some(minJaccard) => corpus dedup gate BEFORE extraction work is
      // spent on duplicates (the standard training-data gate): MinHash-LSH
      // candidates → candidate-restricted Jaccard → CC resolution over the
      // extracted text; only each duplicate cluster's min-id winner flows
      // into inference. Drops are counted in the lineage `dedup` stage.
      dedupMinJaccard: Option[Double] = None,
      // true (default): pin `broadcast(done)` on the resume anti-join —
      // optimal while the done-set fits in driver/executor memory. false:
      // plain left_anti and let AQE size the build side — the scale path
      // once `done` approaches page cardinality (10^12 urls cannot be a
      // pinned broadcast; AQE still picks broadcast while it fits, and
      // demotes to shuffle join when it does not). Mirrors the
      // Hydrator.hydratePrepared(broadcastDims) duality.
      broadcastDone: Boolean = true,
      // Some(buckets) => bucket-sharded operation (the 10^12-url resume
      // shape PLANS.md round-4 named): this run processes ONLY pages whose
      // url bucket (pmod(xxhash64(url), 64) — the same transform the
      // triples/done sinks partition by) is in the set, and the done-set
      // read prunes to exactly those bucket directories at the parquet
      // scan (static partition pruning — no full done-set scan, and the
      // per-shard done subset is 1/64th, so the anti-join stays a
      // broadcast with no exchange of the page side long after the FULL
      // done-set outgrew broadcast). Scope: sharding is exact for the
      // per-page stages (resume, extract, infer, parse, align, hydrate —
      // all per-url or broadcast-dim work). The corpus-GLOBAL stages see
      // only the shard: canonicalization clusters within the shard (a
      // cross-shard surface-variant pair collapses at the periodic
      // compaction pass, exactly like the streaming path) and the
      // dedupMinJaccard gate dedups within the shard only — run the
      // corpus dedup BEFORE sharding when exact global dedup matters.
      // Union-of-shards parity is tested on the default config's per-page
      // path; None = process everything.
      buckets: Option[Seq[Int]] = None,
      emitRdf: Boolean = false,
      checkpointDir: Option[String] = None,
      jobStart: java.sql.Timestamp = java.sql.Timestamp.valueOf("2024-06-01 00:00:00"),
      // Prebuilt bootstrap artifacts (dictionary dedup windows, alias
      // normalization) — build + cache once per job, reuse across runs.
      prebuiltAlias: Option[DataFrame] = None,
      preparedDims: Option[Hydrator.Prepared] = None,
      // Prompt stage (SURVEY P2; reference: text2graph/llm.py:281-311):
      // handlers whose known-entity system prompts are built per page
      // before the client call. None => derive both reference handlers'
      // dictionaries from the dim snapshot (one driver-side collect of the
      // dictionary columns — bootstrap, not per-page work); Some(Seq())
      // disables prompting.
      promptDicts: Option[Seq[Inference.HandlerDict]] = None)

  final case class Result(
      triples: DataFrame,
      lineage: DataFrame,
      rdf: Option[Dataset[Model.RdfTriple]],
      // (url, failed_stage) rows for pages that failed the infer or parse
      // stage (failed_stage = "infer": empty raw after retry exhaustion;
      // "parse": unsalvageable model output) — the per-doc failure state
      // the reference keeps as "NA" placeholder rows
      // (chtc/preprocess_extraction_direct.py:99-110). The commit entry
      // points EXCLUDE these from the done-set, so a failed page is
      // re-driven by the next run instead of being silently marked done
      // with zero triples.
      failedUrls: DataFrame,
      // Unpersists this run's cached intermediates (dedup marks, parsed,
      // aligned). Call AFTER all outputs have materialized — a long-lived
      // session (e.g. one SparkSession serving many runs) leaks the cached
      // frames otherwise; the commit entry points below call it for you.
      cleanup: () => Unit = () => ())

  /** Columns of the output triples table (FIXTURES.md §5). */
  val TripleColumns: Seq[String] = Seq(
    "url", "hashed_text", "model_id", "prompt_version",
    "subj_name", "subj_lat", "subj_lon",
    "predicate", "obj_name", "obj_canonical", "obj_final", "obj_kind",
    "obj_linked", "entity_cluster_id",
    "strat_name", "strat_name_long", "rank", "strat_name_id", "concept_id",
    "b_age", "t_age", "b_period", "t_period",
    "mineral", "mineral_id", "mineral_type", "formula", "formula_source",
    "elements",
    "lith", "lith_id", "lith_type", "lith_group", "lith_class",
    "provenance", "requested_at")

  private val extractUdf = udf((html: Array[Byte]) => HtmlText.extract(html))

  def run(spark: SparkSession, pages0: DataFrame, dims: Dims.Snapshot,
          client: Inference.InferenceClient, cfg: Config = Config()): Result = {

    // J1: resume anti-join against previously committed urls — FIRST, so
    // already-done pages are pruned before any per-page work (broadcast
    // anti-join: no shuffle of the page side). In bucket-sharded mode both
    // sides narrow to the shard's buckets before the join: the page side by
    // filter, the done side by partition-pruned scan.
    val scoped = bucketFilter(pages0, cfg)
    val pages = cfg.checkpointDir match {
      case Some(dir) if fsExists(spark, s"$dir/done") =>
        scoped.join(doneSide(readDone(spark, s"$dir/done", cfg), cfg),
          Seq("url"), "left_anti")
      case _ => scoped
    }

    // Extract stage: html → text (the invariant-bearing step; input_hint
    // demands byte-identical text per url). Runs BEFORE the repartition and
    // immediately drops `html` + the golden column: shuffling both the raw
    // html and the text would double the heaviest data movement of the
    // whole job (pages are the only page-cardinality shuffle there is).
    val hasGolden = pages0.columns.contains("text")
    val extracted0 = pages
      .withColumn("extracted_text", extractUdf(col("html")))
    val slim = (if (hasGolden)
      // direct byte equality — hashing both sides would cost two extra
      // sha256 passes per page for the same answer
      extracted0.withColumn("extract_ok", col("extracted_text") === col("text"))
    else extracted0.withColumn("extract_ok", lit(true)))
      .drop("text", "html")
      .withColumnRenamed("extracted_text", "text")
      .withColumn("hashed_text", sha2(col("text"), 256))

    // Optional corpus dedup gate (training-data hygiene): runs on the
    // extracted text BEFORE any inference tokens are spent on duplicates.
    // Doc ids are content-derived url hashes; the loser set (keep = false)
    // is duplicate-cluster members only — tiny next to the corpus — so the
    // marking join broadcasts under AQE. Both frames persist: `withId`
    // because Dedup.dedupe scans the docs several times (minhash tokens,
    // Jaccard tokens, sizes), `marked` because the lineage stats and the
    // downstream pipeline each consume it.
    val (deduped, dedupStats, dedupCached) = cfg.dedupMinJaccard match {
      case Some(minJ) =>
        val withId = slim.withColumn("doc_id", xxhash64(col("url")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val losers = graft.ops.Dedup
          .dedupe(withId.select("doc_id", "text"), minJ, cfg.canonLocalProbe)
          .filter(!col("keep")).select(col("doc_id").as("drop_id"))
        val marked = withId
          .join(losers, withId("doc_id") === losers("drop_id"), "left")
          .withColumn("dedup_keep", col("drop_id").isNull)
          .drop("drop_id", "doc_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val stats = marked
          .groupBy(spark_partition_id().as("partition_id"))
          .agg(count(lit(1)).as("input_rows"),
            sum(when(col("dedup_keep"), 0L).otherwise(1L)).as("failed_rows"))
          .withColumn("stage", lit("dedup"))
          .withColumn("output_rows", col("input_rows") - col("failed_rows"))
        (marked.filter(col("dedup_keep")).drop("dedup_keep"), Some(stats),
          Seq(withId, marked))
      case None => (slim, None, Seq.empty[DataFrame])
    }

    // B1: explicit url-hash partitioning of the slim rows — the unit of
    // downstream work distribution + lineage.
    val extracted = deduped.repartition(cfg.numPartitions, col("url"))

    // P2 + B2/B3: prompt construction + batched inference in mapPartitions.
    val prompting = cfg.promptDicts
      .getOrElse(Inference.promptDictsFromDims(dims))
    val raw = Inference.run(extracted, client, cfg.microBatch, prompting)

    // P3/P4/P5: lenient parse → validated triples. The PRE-explode frame is
    // the persisted stage boundary — the downstream triple chain explodes
    // it, and the infer/parse failure bookkeeping (lineage stages +
    // Result.failedUrls) reads its parse_status column, all off one cache;
    // without a persist every action would re-run extract+inference+parse
    // from the scan (the reference commits exactly this intermediate to its
    // cache table, chtc/db.py:56-66). Disk-backed so it degrades gracefully
    // when the raw set outgrows executor memory at scale.
    val rawParsed = PostProcess.withParsed(raw.toDF())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val parsed = PostProcess.explodeParsed(rawParsed)

    // J2: alignment — broadcast by default, salted shuffle variant on demand.
    val alias = cfg.prebuiltAlias.getOrElse(Linker.aliasDim(dims))
    val aligned0 =
      if (cfg.saltedAlign) Linker.alignSalted(parsed, alias, cfg.saltBuckets)
      else Linker.align(parsed, alias)
    val aligned1 = cfg.fuzzyAlignMinJaccard
      .map(t => Linker.alignFuzzy(aligned0, alias, t, cfg.fuzzyStopGramMaxDf))
      .getOrElse(aligned0)
    // tier-3's LSH-prune path persists its probe/dict subtrees; collect
    // them here so Result.cleanup releases them with the run's other caches
    val tierCached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val aligned = cfg.cosineAlignMinSim
      .map(t => Linker.alignCosine(aligned1, alias, t,
        lshPrune = cfg.cosineAlignLshPrune, registerCached = tierCached += _))
      .getOrElse(aligned1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // CC canonicalization over the candidate-pair edges.
    val canonical =
      if (cfg.canonicalize) Canonicalizer(aligned, cfg.canonLocalProbe)
      else aligned.withColumn("obj_final", col("obj_canonical"))
        .withColumn("entity_cluster_id", xxhash64(col("obj_kind"), col("obj_canonical")))

    // J3: hydration joins.
    val hydrated = Hydrator.hydratePrepared(canonical,
      cfg.preparedDims.getOrElse(Hydrator.prepare(dims)), cfg.jobStart)
    val triples = hydrated.select(TripleColumns.map(col): _*)

    // Lineage/metrics: one row per partition per stage (replaces the
    // reference's job_id bookkeeping + "NA" failure placeholders,
    // chtc/db.py:26-66).
    val pageStats = extracted
      .groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("input_rows"),
           sum(when(col("extract_ok"), 0L).otherwise(1L)).as("failed_rows"))
      .withColumn("stage", lit("extract"))
      .withColumn("output_rows", col("input_rows") - col("failed_rows"))
    // Infer + parse failure stages (the reference's per-doc "NA" failure
    // bookkeeping, preprocess_extraction_direct.py:99-110): ONE aggregation
    // over the persisted pre-explode frame yields both stage rows — a page
    // with an empty raw failed `infer` (retry exhaustion is deterministic
    // downstream of TransportClient's empty-raw degradation); a page whose
    // non-empty raw yields no triplet list failed `parse`. A
    // legitimately-empty page (valid JSON, zero triplets) fails neither —
    // the distinction the raw-count bookkeeping alone cannot make.
    val inferParse = rawParsed
      .groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("n_in"),
        sum(when(col("parse_status") === PostProcess.StatusInferFailed, 1L)
          .otherwise(0L)).as("n_infer_failed"),
        sum(when(col("parse_status") === PostProcess.StatusParseFailed, 1L)
          .otherwise(0L)).as("n_parse_failed"))
    val inferStats = inferParse.select(
      lit("infer").as("stage"), col("partition_id"),
      col("n_in").as("input_rows"),
      (col("n_in") - col("n_infer_failed")).as("output_rows"),
      col("n_infer_failed").as("failed_rows"))
    val parseStats = inferParse.select(
      lit("parse").as("stage"), col("partition_id"),
      (col("n_in") - col("n_infer_failed")).as("input_rows"),
      (col("n_in") - col("n_infer_failed") - col("n_parse_failed")).as("output_rows"),
      col("n_parse_failed").as("failed_rows"))
    val tripleStats = triples
      .groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("output_rows"))
      .withColumn("stage", lit("triples"))
      .withColumn("input_rows", lit(null).cast("long"))
      .withColumn("failed_rows", lit(0L))
    val lineage = dedupStats.foldLeft(
        pageStats.unionByName(inferStats).unionByName(parseStats)
          .unionByName(tripleStats))(
        (acc, d) => acc.unionByName(d))
      .withColumn("job_start", lit(cfg.jobStart))
      .select("stage", "partition_id", "input_rows", "output_rows",
              "failed_rows", "job_start")

    val failedUrls = rawParsed
      .filter(col("parse_status") =!= PostProcess.StatusOk)
      .select(col("url"),
        PostProcess.failedStage(col("parse_status")).as("failed_stage"))

    val rdf = if (cfg.emitRdf) Some(Rdf.fromHydrated(hydrated, dims)) else None
    val cached = dedupCached ++ tierCached :+ rawParsed :+ aligned
    Result(triples, lineage, rdf, failedUrls,
      () => cached.foreach(_.unpersist(blocking = false)))
  }

  /** Run + commit: write triples and lineage, then mark urls done so a
    * subsequent run with the same checkpointDir is incremental
    * (idempotent re-entry — running twice yields the same table). */
  def runAndCommit(spark: SparkSession, pages: DataFrame, dims: Dims.Snapshot,
                   client: Inference.InferenceClient, outDir: String,
                   cfg: Config = Config()): Unit = {
    val checkpointed = cfg.copy(checkpointDir = Some(s"$outDir/checkpoint"))
    val res = run(spark, pages, dims, client, checkpointed)
    // 64-way url-hash bucketing — the parquet stand-in for the Iceberg
    // `bucket(url)` partition transform (FIXTURES.md §5): point lookups by
    // url prune to one bucket, appends from resumed runs stay co-located.
    res.triples
      .withColumn("url_bucket", urlBucket(col("url")))
      .write.mode("append").partitionBy("url_bucket").parquet(s"$outDir/triples")
    res.lineage.write.mode("append").parquet(s"$outDir/lineage")
    res.rdf.foreach(_.write.mode("append").parquet(s"$outDir/rdf"))
    // commit the done-set last: urls become "done" only after data landed;
    // append only NEWLY processed urls so the checkpoint table doesn't
    // accumulate duplicates across resumed runs. Urls that FAILED infer or
    // parse this run are excluded — they stay not-done, so the next run's
    // resume anti-join re-drives them (the reference's re-drivable "NA"
    // placeholder semantics; with a deterministic client they fail again,
    // with a healed transport they heal).
    val donePath = s"$outDir/checkpoint/done"
    val newUrls =
      if (fsExists(spark, donePath)) {
        val done = readDone(spark, donePath, cfg)
        bucketFilter(pages.select("url"), cfg)
          .join(doneSide(done, cfg), Seq("url"), "left_anti")
      } else bucketFilter(pages.select("url"), cfg)
    // done-set layout mirrors the triples sink: url_bucket-partitioned, so
    // a bucket-sharded resume prunes its scan to the shard's directories.
    // (Pre-bucketing checkpoint dirs keep their flat layout — mixing flat
    // files and partition dirs would break parquet partition discovery.)
    val doneIsFlat = fsExists(spark, donePath) &&
      !spark.read.parquet(donePath).columns.contains("url_bucket")
    val committed = newUrls.join(doneSide(res.failedUrls, cfg), Seq("url"), "left_anti")
    if (doneIsFlat) committed.write.mode("append").parquet(donePath)
    else committed.withColumn("url_bucket", urlBucket(col("url")))
      .write.mode("append").partitionBy("url_bucket").parquet(donePath)
    res.cleanup()
  }

  /** Run + snapshot-commit: triples and the resume `done` set publish in
    * ONE atomic snapshot (graft.sources.SnapshotStore — the Iceberg-commit
    * stand-in). Compared to [[runAndCommit]]'s write-data-then-mark-done
    * two-step (the reference's shape, chtc/db.py:56-66), a crash anywhere
    * here leaves the store exactly at the previous snapshot: no partial
    * data, no done-urls without data, and a re-run converges to the same
    * final table (exactly-once with deterministic stages). */
  def runAndCommitSnapshot(spark: SparkSession, pages: DataFrame, dims: Dims.Snapshot,
                           client: Inference.InferenceClient, tableDir: String,
                           cfg: Config = Config()): Int = {
    import graft.sources.SnapshotStore
    // Done-set read: in bucket-sharded mode the store's url_bucket=N/
    // staging layout lets the MANIFEST prune the file list to the shard's
    // buckets before any IO — the snapshot-store counterpart of the parquet
    // checkpoint's PartitionFilters scan. Files from pre-partitioning
    // snapshots carry no path marker and are kept (then row-filtered below);
    // pruning is the IO saver, the bucketFilter row predicate remains the
    // correctness filter either way.
    val done = cfg.buckets match {
      case Some(bs) =>
        val markers = bs.map(b => s"url_bucket=$b/")
        SnapshotStore.readPruned(spark, tableDir, "done",
          f => !f.contains("url_bucket=") || markers.exists(f.contains))
      case None => SnapshotStore.read(spark, tableDir, "done")
    }
    val scoped = bucketFilter(pages, cfg)
    val todo = done match {
      case Some(d) =>
        scoped.join(
          doneSide(bucketFilter(d.select("url"), cfg), cfg), Seq("url"), "left_anti")
      case None => scoped
    }
    val res = run(spark, todo, dims, client, cfg)
    val triples = res.triples
      .withColumn("url_bucket", urlBucket(col("url")))
    // failed-url exclusion: same re-drivable semantics as runAndCommit —
    // the snapshot's done table never claims a page whose infer/parse
    // failed this run. Both url-keyed tables stage url_bucket-partitioned,
    // so every later sharded run (and url point lookup) prunes at the
    // manifest.
    val snap = SnapshotStore.commit(spark, tableDir, Map(
      "triples" -> triples,
      "lineage" -> res.lineage,
      "done" -> todo.select("url")
        .join(doneSide(res.failedUrls, cfg), Seq("url"), "left_anti")
        .withColumn("url_bucket", urlBucket(col("url")))),
      partitionBy = Map("triples" -> Seq("url_bucket"),
        "done" -> Seq("url_bucket")))
    res.cleanup()
    snap
  }

  /** Small-file compaction for a KG snapshot store (the
    * `rewrite_data_files` maintenance job): every [[runAndCommitSnapshot]]
    * run and every streaming micro-batch APPENDS files, so a long-lived
    * store's manifest file list — and with it scan planning and per-file
    * open cost — grows without bound even at stable data volume. This
    * rewrites the store's current content into a compact file set in one
    * replace-mode snapshot: the url-keyed tables re-establish the
    * `url_bucket=N/` layout (recomputed from `url` — the file data cannot
    * carry it, staging strips partition columns) at roughly one file per
    * bucket, so manifest pruning keeps working; log tables (lineage,
    * failed) coalesce to a bounded count. Row sets are byte-identical —
    * pure layout maintenance, schedule-composable; [[graft.sources
    * .SnapshotStore.expireSnapshots]] reclaims the replaced files. */
  def compactStoreFiles(spark: SparkSession, tableDir: String): Option[Int] = {
    def bucketed(table: String)(df: DataFrame): (DataFrame, Seq[String]) =
      stageBucketLayout(spark, tableDir, table, df) match {
        case (d, Seq()) => (d.coalesce(8), Seq.empty)
        case (d, cols) => (d.repartition(UrlBuckets, col("url_bucket")), cols)
      }
    graft.sources.SnapshotStore.rewriteTables(spark, tableDir,
      Seq("triples", "done", "lineage", "failed"),
      stage = Map("triples" -> bucketed("triples") _,
        "done" -> bucketed("done") _))
  }

  /** Decide a url-keyed store table's rewrite staging layout from the
    * MANIFEST, not the read schema. A mixed store (old flat files carrying
    * url_bucket as a data column + new Hive-partitioned files without it)
    * resolves its merged read schema from whichever file Spark samples
    * first — schema-based detection would then either persist NULL buckets
    * or silently drop the layout. Manifest rule instead:
    *  - any `url_bucket=` path marker ⇒ the store is on (or migrating to)
    *    the partitioned layout: recompute the bucket from `url` (dropping
    *    a stale data column if the merged schema surfaced one) and stage
    *    partitioned — mixed stores CONVERGE to the pure layout;
    *  - no markers and the data carries url_bucket ⇒ pure legacy store:
    *    keep the schema byte-stable, no partitioning;
    *  - no url column at all ⇒ not url-keyed, stage as-is. */
  private[graft] def stageBucketLayout(spark: SparkSession, dir: String,
      table: String, df: DataFrame): (DataFrame, Seq[String]) = {
    val hasMarkers = graft.sources.SnapshotStore
      .fileCount(spark, dir, table, _.contains("url_bucket=")) > 0
    if (!df.columns.contains("url")) (df, Seq.empty)
    else if (!hasMarkers && df.columns.contains("url_bucket")) (df, Seq.empty)
    else {
      val clean =
        if (df.columns.contains("url_bucket")) df.drop("url_bucket") else df
      (clean.withColumn("url_bucket", urlBucket(col("url"))), Seq("url_bucket"))
    }
  }

  /** Resume done-set build side: pinned broadcast (default, unbeatable
    * while it fits) or un-hinted for AQE sizing (the page-cardinality
    * scale path — an explicit hint cannot be demoted by AQE). */
  private def doneSide(done: DataFrame, cfg: Config): DataFrame =
    if (cfg.broadcastDone) broadcast(done) else done

  /** Narrow a url-keyed frame to the configured bucket shard (no-op when
    * bucket sharding is off). */
  private def bucketFilter(df: DataFrame, cfg: Config): DataFrame =
    cfg.buckets match {
      case Some(bs) => df.filter(urlBucket(col("url")).isin(bs.map(_.toLong): _*))
      case None => df
    }

  /** Read the done-set. In bucket-sharded mode against the partitioned
    * layout the url_bucket predicate is a PARTITION filter: the scan reads
    * only the shard's bucket directories (verified executed-plan evidence
    * in PLANS.md round-5 — `PartitionFilters: [url_bucket IN (...)]`,
    * no full done-set IO). Flat (pre-bucketing) layouts fall back to a
    * recomputed-bucket row filter — same rows, no pruning. */
  private def readDone(spark: SparkSession, path: String, cfg: Config): DataFrame = {
    val done0 = spark.read.parquet(path)
    val pruned = cfg.buckets match {
      case Some(bs) if done0.columns.contains("url_bucket") =>
        done0.filter(col("url_bucket").isin(bs.map(_.toLong): _*))
      case Some(bs) => done0.filter(urlBucket(col("url")).isin(bs.map(_.toLong): _*))
      case None => done0
    }
    pruned.select("url")
  }

  private def fsExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
