package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.kg._

/** Structured Streaming skin over the KG pipeline.
  *
  * The reference is pure batch (SURVEY §2.8), but a web-scale crawl is
  * naturally a stream of WARC segments: this module runs the same stage
  * chain — extract → batched inference → lenient parse → alignment — as an
  * incremental `readStream` over arriving page files. Stages were designed
  * stream-compatible from the start: every transform is either stateless
  * (map/mapPartitions/UDF) or a broadcast join, so the streaming plan is
  * the batch plan minus the two inherently-global steps:
  *  - connected-components canonicalization (iterative; runs as a periodic
  *    batch compaction over the accumulated triples table instead),
  *  - cross-batch dedup (handled by the downstream table's merge keys).
  *
  * Plus the event-side streaming operators: watermarked tumbling-window
  * aggregation and mapGroupsWithState sessionization.
  */
object StreamingKg {

  val PageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** Incremental page source: a directory where crawl segments land. */
  def pagesStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(PageSchema).parquet(dir)

  /** Streaming corpus dedup gate — the incremental counterpart of the
    * batch pipeline's `dedupMinJaccard`: exact-duplicate pages (same
    * extracted-text hash) arriving within the lateness horizon are dropped
    * with watermark-bounded state, so a crawl that re-fetches a page (or
    * mirrors serving identical content) spends inference once. Near-dup
    * (Jaccard) clustering is inherently corpus-global and stays in the
    * periodic batch compaction, like canonicalization. Input must carry
    * `warc_ts` and a `hashed_text` column (or call after the extract
    * stage). */
  def dedupPagesStream(pages: DataFrame, watermark: String = "1 hour"): DataFrame =
    pages.withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("hashed_text")

  /** Streaming triple extraction: extract → [exact-dedup gate] →
    * prompt-build → infer → parse → align → hydrate. Identical per-row
    * semantics to the batch pipeline (same functions, including the prompt
    * stage — stateless, so it streams). `dedupWatermark = Some(horizon)`
    * inserts [[dedupPagesStream]] between extraction and inference — the
    * streaming counterpart of the batch `Config.dedupMinJaccard` gate, so
    * re-fetched identical pages never reach the model.
    *
    * Hydration is the batch pipeline's `Hydrator.hydratePrepared` verbatim
    * — stateless broadcast left joins against the prepared dim snapshot
    * (the window-dedup key build is CACHED, so micro-batches re-read the
    * materialized keys instead of re-running the dedup windows), so the
    * streamed output unit is the HYDRATED triplet
    * with the batch pipeline's exact `KgPipeline.TripleColumns` schema
    * (the reference's output unit is always the hydrated triplet,
    * text2graph/schema.py:441-447). The one batch-only step remaining is
    * global canonicalization, which is inherently cross-batch and runs in
    * [[compactCanonicalize]]; until then `obj_final = obj_canonical`, the
    * same rule as the batch `canonicalize = false` path. */
  def triplesStream(pages: DataFrame, dims: Dims.Snapshot,
                    client: Inference.InferenceClient,
                    microBatch: Int = 200,
                    dedupWatermark: Option[String] = None,
                    jobStart: java.sql.Timestamp =
                      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"),
                    prebuiltAlias: Option[DataFrame] = None,
                    preparedDims: Option[Hydrator.Prepared] = None): DataFrame = {
    val rawParsed = rawParsedStream(pages, dims, client, microBatch, dedupWatermark)
    val parsed = PostProcess.explodeParsed(rawParsed)
    val aligned = Linker.align(parsed,
        prebuiltAlias.getOrElse(Linker.aliasDim(dims)))
      .withColumn("obj_final", col("obj_canonical"))
      .withColumn("entity_cluster_id", xxhash64(col("obj_kind"), col("obj_canonical")))
    // cache the prepared (window-deduped) hydration keys: the static side
    // of a stream-static join is re-evaluated every micro-batch, and
    // without the cache each batch would re-run the 4-tier strat union +
    // firstHit windows — bootstrap work, not per-batch work. A caller that
    // already holds a prepared snapshot (the gate's cachedDims) passes it
    // in instead of building a duplicate cached copy — and OWNS its
    // lifetime. A long-running caller on the default path should build
    // `Hydrator.prepare(dims).cached()` itself, pass it here, and
    // `unpersist()` it when the query stops (the sink path's
    // FailureSink.release() does exactly this); the default exists for
    // short-lived jobs whose session ends with the query.
    Hydrator.hydratePrepared(aligned,
        preparedDims.getOrElse(Hydrator.prepare(dims).cached()), jobStart)
      .select(KgPipeline.TripleColumns.map(col): _*)
  }

  /** The streaming pipeline's PRE-explode stage: extract → [exact-dedup
    * gate] → prompt-build → infer → lenient parse, keeping the per-page
    * `parse_status` discriminator (the batch pipeline's persisted stage
    * boundary, PostProcess.withParsed). Feed this to
    * [[snapshotSinkWithFailures]] when the stream must carry the failure
    * bookkeeping; [[triplesStream]] is this plus explode-align-hydrate. */
  def rawParsedStream(pages: DataFrame, dims: Dims.Snapshot,
                      client: Inference.InferenceClient,
                      microBatch: Int = 200,
                      dedupWatermark: Option[String] = None,
                      promptDicts: Option[Seq[Inference.HandlerDict]] = None): DataFrame = {
    // shared bounded bootstrap (Inference.promptDictsFromDims guards the
    // driver collect); an open-vocabulary deployment passes its capped
    // top-df dictionary slice via promptDicts instead
    val prompting = promptDicts
      .getOrElse(Inference.promptDictsFromDims(dims))
    val extracted0 = pages
      .withColumn("text", udf((h: Array[Byte]) => HtmlText.extract(h)).apply(col("html")))
      .withColumn("hashed_text", sha2(col("text"), 256))
    val extracted = dedupWatermark
      .map(w => dedupPagesStream(extracted0, w)).getOrElse(extracted0)
    PostProcess.withParsed(
      Inference.run(extracted, client, microBatch, prompting).toDF())
  }

  /** Exactly-once micro-batch commit into the snapshot store: a restarted
    * query replays its last batch, so batches at-or-below the manifest's
    * committed batch_id are skipped — replay becomes a no-op instead of a
    * duplicate append. Returns the committed version, None when skipped. */
  def commitBatch(dir: String, table: String, batch: DataFrame,
                  batchId: Long): Option[Int] =
    commitBatchTables(dir, Map(table -> batch), batchId)

  /** Multi-table form of [[commitBatch]]: all tables publish in the SAME
    * atomic snapshot (or none, on batch replay). */
  def commitBatchTables(dir: String, tables: Map[String, DataFrame],
                        batchId: Long): Option[Int] = {
    require(tables.nonEmpty, "commitBatchTables needs at least one table")
    import graft.sources.SnapshotStore
    val spark = tables.head._2.sparkSession
    val cur = SnapshotStore.currentVersion(spark, dir)
    val last =
      if (cur == 0) -1L
      else SnapshotStore.readSnapshot(spark, dir, cur)
        .meta.get("batch_id").map(_.toLong).getOrElse(-1L)
    if (batchId <= last) None
    else Some(SnapshotStore.commit(spark, dir, tables,
      meta = Map("batch_id" -> batchId.toString)))
  }

  /** Streaming triples sink: every micro-batch publishes as one atomic
    * snapshot (graft.sources.SnapshotStore), giving the streaming path the
    * same snapshot-isolation + exactly-once story as the batch commit. */
  def snapshotSink(df: DataFrame, dir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        commitBatch(dir, "triples", batch.toDF(), batchId); ()
      }

  /** A started failure sink plus the release hook for its bootstrap
    * caches. [[snapshotSinkWithFailures]] caches the static side of every
    * stream-static stage once per QUERY (dim keys, alias table, derived
    * tier dictionaries) — state Spark cannot age out for us because it
    * belongs to the writer closure, not the stream. The OWNER of the query
    * calls `release()` after the query stops (idempotent; safe to put in a
    * `finally`) or the caches outlive the job (ADVICE round 5). */
  final case class FailureSink(
      writer: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row],
      private val caches: () => Unit) {
    private val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    def release(): Unit = if (released.compareAndSet(false, true)) caches()
  }

  /** Streaming sink WITH failure bookkeeping — the streaming form of the
    * batch commit's "NA" semantics: input is the pre-explode
    * [[rawParsedStream]], and each micro-batch splits BATCH-SIDE (no
    * second pass over the source, hence no second inference spend) into
    *  - `triples`: exploded → aligned → hydrated rows
    *    (KgPipeline.TripleColumns), and
    *  - `failed`: (url, failed_stage) for pages whose infer or parse
    *    failed this batch — an append-only failure log a re-drive job
    *    anti-joins against the accumulated triples table,
    * committed together in ONE atomic snapshot (exactly-once via the
    * batch_id watermark: a replayed micro-batch re-commits neither).
    *
    * The optional alignment tiers mirror the batch `KgPipeline.Config`
    * (fuzzyAlignMinJaccard / fuzzyStopGramMaxDf / cosineAlignMinSim /
    * cosineAlignLshPrune) and run INSIDE each micro-batch: every tier is a
    * per-name argmax against the STATIC dictionary — independent of which
    * other names share the batch — so micro-batch scoping changes nothing
    * vs the batch pipeline on the same pages (parity-tested in
    * StreamingSpec). Unlike canonicalization (corpus-global, deferred to
    * [[compactCanonicalize]]), the tiers need no cross-batch state. */
  def snapshotSinkWithFailures(rawParsed: DataFrame, dir: String,
                               dims: Dims.Snapshot,
                               jobStart: java.sql.Timestamp =
                                 java.sql.Timestamp.valueOf("2024-06-01 00:00:00"),
                               fuzzyMinJaccard: Option[Double] = None,
                               fuzzyStopGramMaxDf: Option[Int] = None,
                               cosineMinSim: Option[Double] = None,
                               cosineLshPrune: Option[(Int, Int)] = None): FailureSink = {
    // bootstrap once per query, reused by every micro-batch closure — the
    // static side of every stream-static stage (hydration keys, alias
    // table, each tier's DERIVED dictionary frame: gram arrays,
    // gram-bucket embeddings, and the fuzzy tier's stop-gram list — all
    // pure functions of the dictionary, never the batch) is cached here,
    // or each micro-batch would re-run the identical dictionary
    // featurization. Released by FailureSink.release() when the owner is
    // done with the query.
    val prepared = Hydrator.prepare(dims).cached()
    val alias = Linker.aliasDim(dims).cache()
    val fuzzyDict = fuzzyMinJaccard
      .map(_ => Linker.fuzzyDict(alias).persist())
    val fuzzyStop = for { d <- fuzzyDict; cap <- fuzzyStopGramMaxDf }
      yield Linker.stopGrams(d, cap).persist()
    val cosineDict = cosineMinSim
      .map(_ => Linker.cosineDict(alias).persist())
    val writer = rawParsed.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF().persist()
        // per-batch caches the tiers create for THIS batch's rows (the
        // cosine LSH prune persists its probe subtree) — released with the
        // batch frame, so a long-running stream holds only the bootstrap
        val batchCached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        try {
          val tier1 = Linker.align(PostProcess.explodeParsed(b), alias)
          val tier2 = fuzzyMinJaccard
            .map(Linker.alignFuzzy(tier1, alias, _, fuzzyStopGramMaxDf,
              prebuiltDict = fuzzyDict, prebuiltStopGrams = fuzzyStop))
            .getOrElse(tier1)
          val tier3 = cosineMinSim
            .map(t => Linker.alignCosine(tier2, alias, t,
              lshPrune = cosineLshPrune, prebuiltDict = cosineDict,
              registerCached = batchCached += _))
            .getOrElse(tier2)
          val aligned = tier3
            .withColumn("obj_final", col("obj_canonical"))
            .withColumn("entity_cluster_id",
              xxhash64(col("obj_kind"), col("obj_canonical")))
          val triples = Hydrator.hydratePrepared(aligned, prepared, jobStart)
            .select(KgPipeline.TripleColumns.map(col): _*)
          val failed = b
            .filter(col("parse_status") =!= PostProcess.StatusOk)
            .select(col("url"),
              PostProcess.failedStage(col("parse_status")).as("failed_stage"))
          commitBatchTables(dir, Map("triples" -> triples, "failed" -> failed), batchId)
        } finally {
          batchCached.foreach(_.unpersist(blocking = false))
          b.unpersist()
        }
        ()
      }
    FailureSink(writer, () => {
      prepared.unpersist()
      alias.unpersist(blocking = false)
      (fuzzyDict.toSeq ++ fuzzyStop ++ cosineDict)
        .foreach(_.unpersist(blocking = false))
    })
  }

  /** Re-drive job for the streaming failure log — the consumer
    * [[snapshotSinkWithFailures]]'s `failed` table was missing: the BATCH
    * path re-drives failed urls automatically (they are excluded from the
    * done set, so the next run's resume anti-join picks them up), while a
    * streaming deployment's checkpoint never re-offers a processed page.
    * This job closes the loop, mirroring the reference's "re-run the same
    * job over the NA rows" semantics
    * (chtc/preprocess_extraction_direct.py:99-110):
    *
    *  1. read the accumulated `failed` log and drop every url that already
    *     has triples in the store (healed by an earlier re-drive or a
    *     later append) — those clear from the log unconditionally;
    *  2. re-run the batch pipeline (`canonicalize = false` + the same
    *     alignment tiers as the sink — identical per-page semantics to a
    *     micro-batch) over the remaining urls' pages from `pages`;
    *  3. commit healed pages' triples (APPEND) and the rewritten failure
    *     log (REPLACE: fresh failure rows for pages that failed again,
    *     carried rows for target urls absent from `pages`) in ONE atomic
    *     snapshot — a crash leaves the store at the prior version, and
    *     re-running converges (exactly-once via determinism, like every
    *     commit in this store).
    *
    * Returns the committed version; None when the store has no failure
    * log (absent table, or already emptied by a prior re-drive — the job
    * is a read-only no-op then, committing nothing). A fully healed run
    * leaves the `failed` table with ZERO rows. */
  /** @param broadcastTarget pins the re-drive url set as a broadcast join
    *        build side — right while the failure log is incident-sized.
    *        A corpus-wide outage makes the log page-cardinality, and a
    *        pinned broadcast cannot be demoted by AQE — pass `false` for
    *        a plain semi-join AQE sizes from runtime stats (the
    *        KgPipeline.broadcastDone duality, same rationale). */
  def redriveFailed(spark: SparkSession, dir: String, pages: DataFrame,
                    dims: Dims.Snapshot, client: Inference.InferenceClient,
                    jobStart: java.sql.Timestamp =
                      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"),
                    fuzzyMinJaccard: Option[Double] = None,
                    fuzzyStopGramMaxDf: Option[Int] = None,
                    cosineMinSim: Option[Double] = None,
                    cosineLshPrune: Option[(Int, Int)] = None,
                    broadcastTarget: Boolean = true): Option[Int] = {
    import graft.sources.SnapshotStore
    val readVersion = SnapshotStore.currentVersion(spark, dir)
    SnapshotStore.read(spark, dir, "failed", Some(readVersion).filter(_ > 0))
      .filterNot(_.isEmpty).map { failed =>
      val triplesUrls = SnapshotStore
        .read(spark, dir, "triples", Some(readVersion))
        .map(_.select("url").distinct())
      val target0 = failed.select("url").distinct()
      val target = triplesUrls
        .map(t => target0.join(t, Seq("url"), "left_anti"))
        .getOrElse(target0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // pages to re-run: target urls the corpus still has. Target urls the
      // corpus LOST keep their old log rows — clearing them silently would
      // erase the only record that extraction never succeeded.
      val targetSide = if (broadcastTarget) broadcast(target) else target
      val redrive = pages.join(targetSide, Seq("url"), "left_semi")
      val res = KgPipeline.run(spark, redrive, dims, client,
        KgPipeline.Config(canonicalize = false, jobStart = jobStart,
          fuzzyAlignMinJaccard = fuzzyMinJaccard,
          fuzzyStopGramMaxDf = fuzzyStopGramMaxDf,
          cosineAlignMinSim = cosineMinSim,
          cosineAlignLshPrune = cosineLshPrune))
      val stillMissing = target
        .join(pages.select("url").distinct(), Seq("url"), "left_anti")
      val carried = failed
        .join(stillMissing, Seq("url"), "left_semi")
        .groupBy("url").agg(min("failed_stage").as("failed_stage"))
      val newLog = res.failedUrls.unionByName(carried)
      val healedTriples = res.triples.select(KgPipeline.TripleColumns.map(col): _*)
      // requireVersion: a micro-batch appending to `failed` between our
      // read and this publish must fail the rewrite (re-run the job), not
      // silently vanish under the replaced log
      val v = SnapshotStore.commitMixed(spark, dir,
        append = Map("triples" -> healedTriples),
        replace = Map("failed" -> newLog),
        meta = Map("compaction" -> "redrive"),
        requireVersion = Some(readVersion))
      res.cleanup()
      target.unpersist(blocking = false)
      v
    }
  }

  /** Periodic batch compaction — the cross-batch step the incremental
    * stream cannot do: global connected-components canonicalization over
    * the ACCUMULATED triples table, so surface variants that arrived in
    * different micro-batches collapse to one canonical entity. Publishes
    * as a replace-mode snapshot (readers of older versions still see the
    * uncompacted files — time travel). Returns the new version, None when
    * the store has no triples yet. */
  /** @param dims when supplied, rows are RE-hydrated after
    *        canonicalization: a row whose obj_final moved to a new cluster
    *        canonical carries hydration columns joined on the OLD name —
    *        re-running the (stateless, broadcast) hydration joins on the
    *        compacted names brings the dim columns back in line with the
    *        batch pipeline's canonicalize-then-hydrate order. The stored
    *        per-row `requested_at` is PRESERVED through re-hydration
    *        (passed to hydratePrepared as the provenance timestamp source),
    *        so compacting never restamps the provenance history of rows an
    *        earlier run committed — `jobStart` is only the fallback for a
    *        store whose rows predate the column (ADVICE round 5). Omitted,
    *        the hydration columns pass through unchanged (pure-canonicalize
    *        compaction). */
  def compactCanonicalize(spark: SparkSession, dir: String,
                          dims: Option[Dims.Snapshot] = None,
                          jobStart: java.sql.Timestamp =
                            java.sql.Timestamp.valueOf("2024-06-01 00:00:00")): Option[Int] = {
    import graft.sources.SnapshotStore
    val readVersion = SnapshotStore.currentVersion(spark, dir)
    SnapshotStore.read(spark, dir, "triples",
        Some(readVersion).filter(_ > 0)).map { triples =>
      // Schema-stable rewrite: canonicalization's improvement folds into
      // obj_canonical and the output projects back to the stream's exact
      // column set — later micro-batches append the same schema, so
      // SnapshotStore.read never sees a mixed-schema file list. Folding is
      // idempotent: re-canonicalizing already-canonical values is a no-op.
      val canonicalized = Canonicalizer(triples)
      val rehydrated = dims match {
        case Some(d) =>
          val core = Seq("url", "hashed_text", "model_id", "prompt_version",
            "subj_name", "predicate", "obj_name", "obj_kind", "obj_canonical",
            "obj_linked", "obj_final", "entity_cluster_id", "requested_at")
            .filter(canonicalized.columns.contains)
          Hydrator.hydratePrepared(
            canonicalized.select(core.map(col): _*), Hydrator.prepare(d), jobStart,
            requestedAt =
              if (core.contains("requested_at")) Some(col("requested_at")) else None)
        case None => canonicalized
      }
      val compacted = rehydrated
        .withColumn("obj_canonical", col("obj_final"))
        .select(triples.columns.map(col): _*)
      val (staged, parts) = bucketStaged(spark, dir, compacted)
      // commitReplace carries the prior snapshot's meta forward internally —
      // commitBatch's exactly-once check reads meta.batch_id from the HEAD
      // snapshot, and a compaction that dropped it would reset the watermark
      // to -1 and let a restarted query re-append its replayed micro-batch.
      SnapshotStore.commitReplace(spark, dir,
        Map("triples" -> staged),
        meta = Map("compaction" -> "canonicalize"),
        partitionBy = parts,
        requireVersion = Some(readVersion))
    }
  }

  /** Cross-shard/cross-batch dedup compaction — the global counterpart of
    * the per-run `Config.dedupMinJaccard` gate, closing the documented
    * within-shard-only scope of bucket-sharded operation
    * (KgPipeline.Config.buckets): near-dup page clusters that SPAN shards
    * (or micro-batches) are never collapsed by the per-run gate, so their
    * triples accumulate in the store. This pass runs the identical dedup
    * kernel (MinHash-LSH candidates → candidate-restricted Jaccard → CC,
    * graft.ops.Dedup.dedupe, winner = cluster-min doc_id = xxhash64(url))
    * GLOBALLY and drops losers' triples, committing the rewritten table
    * and a `compact_dedup` lineage row in ONE atomic snapshot (replace
    * triples + append lineage — commitMixed). The reference's analog is
    * its frozen global id list, the one corpus-global artifact its batch
    * jobs share (chtc/preprocess_extraction_direct.py:19-28).
    *
    * `corpus` must be the SAME (url, text) universe the sharded runs
    * consumed — competition runs over the FULL corpus, not just store
    * members, because a duplicate chain can connect two stored winners
    * only THROUGH a page some shard already dropped (A~X~B with
    * J(A,B) < t): restricted to the store the chain is invisible and both
    * survive, while the unsharded gate collapses it. With the full corpus
    * the kept set provably equals the unsharded run's: every shard winner
    * is its shard-subcluster's min, so the global cluster min is always a
    * stored row, and everything else drops (parity-tested).
    *
    * Done/failed tables are untouched: dropped urls WERE processed — they
    * must not be re-driven, they are duplicates. Returns the committed
    * version, None when the store has no triples. */
  def compactDedup(spark: SparkSession, dir: String, corpus: DataFrame,
                   minJaccard: Double, localProbe: Boolean = true,
                   jobStart: java.sql.Timestamp =
                     java.sql.Timestamp.valueOf("2024-06-01 00:00:00")): Option[Int] = {
    import graft.sources.SnapshotStore
    val readVersion = SnapshotStore.currentVersion(spark, dir)
    SnapshotStore.read(spark, dir, "triples",
        Some(readVersion).filter(_ > 0)).map { triples0 =>
      // the store read feeds the drop bookkeeping AND the rewrite staging —
      // persist so the parquet scan runs once, not once per action
      val triples = triples0
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val docs = corpus.select(col("url"), col("text"))
        .withColumn("doc_id", xxhash64(col("url")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val losers = graft.ops.Dedup
        .dedupe(docs.select("doc_id", "text"), minJaccard, localProbe)
        .filter(!col("keep")).select(col("doc_id").as("drop_id"))
      // loser urls are duplicate-cluster members only — tiny next to the
      // corpus, so the rewrite anti-join broadcasts under AQE
      val loserUrls = docs.join(losers, docs("doc_id") === losers("drop_id"))
        .select("url").distinct() // one row per url even on a dup-url corpus
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val kept = triples.join(loserUrls, Seq("url"), "left_anti")
      val (keptStaged, keptParts) = bucketStaged(spark, dir, kept)
      // ONE bookkeeping pass: total rows + dropped rows + dropped urls
      // from a single aggregation over the store join (meta counts are
      // STORE-level: corpus losers with no stored triples — e.g. pages a
      // shard's own gate already dropped — don't inflate the numbers)
      val stats = triples
        .join(loserUrls.withColumn("is_drop", lit(true)), Seq("url"), "left")
        .agg(count(lit(1)).as("in_rows"),
          coalesce(sum(when(col("is_drop"), 1L)), lit(0L)).as("drop_rows"),
          count_distinct(when(col("is_drop"), col("url"))).as("drop_urls"))
        .collect().head
      val inRows = stats.getLong(0)
      val dropRows = stats.getLong(1)
      val droppedUrls = stats.getLong(2)
      val lineageRow = {
        import spark.implicits._
        Seq(("compact_dedup", null.asInstanceOf[java.lang.Long],
          inRows, inRows - dropRows, dropRows))
          .toDF("stage", "partition_id", "input_rows", "output_rows",
            "failed_rows")
          // match the pipeline lineage schema exactly (partition_id is the
          // int spark_partition_id(); a global pass has none)
          .withColumn("partition_id", col("partition_id").cast("int"))
          .withColumn("job_start", lit(jobStart))
      }
      // requireVersion: a concurrent append to triples between our read
      // and this publish must abort the rewrite, not vanish under it
      val v = SnapshotStore.commitMixed(spark, dir,
        append = Map("lineage" -> lineageRow),
        replace = Map("triples" -> keptStaged),
        meta = Map("compaction" -> "dedup",
          "dedup_dropped_urls" -> droppedUrls.toString,
          "dedup_dropped_triples" -> dropRows.toString),
        partitionBy = keptParts,
        requireVersion = Some(readVersion))
      triples.unpersist(blocking = false)
      docs.unpersist(blocking = false)
      loserUrls.unpersist(blocking = false)
      v
    }
  }

  /** Preserve (or establish) the url_bucket staging layout on a triples
    * rewrite, so manifest-level pruning ([[graft.sources.SnapshotStore
    * .readPruned]]) keeps working after a compaction. A legacy store whose
    * FILES carry url_bucket as a data column keeps its schema untouched
    * (no partitioning — mixing would drift the read schema); everything
    * else is staged Hive-partitioned on the recomputed bucket, which the
    * partitionBy write strips from the file data — reads stay
    * schema-identical to the streaming sink's TripleColumns. Layout is
    * decided from the MANIFEST via [[KgPipeline.stageBucketLayout]]
    * (read-schema detection misclassifies mixed old/new stores). */
  private def bucketStaged(spark: SparkSession, dir: String,
                           df: DataFrame): (DataFrame, Map[String, Seq[String]]) =
    KgPipeline.stageBucketLayout(spark, dir, "triples", df) match {
      case (d, Seq()) => (d, Map.empty)
      case (d, cols) => (d, Map("triples" -> cols))
    }

  /** Cross-micro-batch exactly-once on the EVENT side: duplicate ids
    * arriving within the lateness horizon are dropped with bounded state —
    * the watermark ages dedup state out, so state size tracks the horizon,
    * not the stream length (at-least-once upstreams become effectively
    * exactly-once without unbounded keys). */
  def dedupEvents(events: DataFrame, idCol: String = "event_id",
                  watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Watermarked stream-stream inner join: clicks landing within
    * `windowMinutes` AFTER an error by the same user — the streaming form
    * of the batch `events_range_join` (graft.ops.RangeJoin). Both inputs
    * are watermarked and the join predicate bounds event time in BOTH
    * directions (ts >= err_ts and ts <= err_ts + window), so Spark derives
    * state-eviction watermarks for both buffers: state size tracks the
    * lateness horizon + join window, never the stream length. */
  /** @param joinType "inner" (matches only) or "left_outer": a click with
    *        no error in its window emits once with a null err_id AFTER the
    *        watermark proves no matching error can still arrive — the
    *        streaming form of the batch left join's null-keeping. */
  def clicksAfterErrors(clicks: DataFrame, errors: DataFrame,
                        windowMinutes: Int = 10,
                        watermark: String = "10 minutes",
                        joinType: String = "inner"): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
        col("user_id"), col("ts"))
      .withWatermark("ts", watermark)
    val e = errors.select(col("event_id").as("err_id"),
        col("user_id").as("err_user_id"), col("ts").as("err_ts"))
      .withWatermark("err_ts", watermark)
    c.join(e,
        col("user_id") === col("err_user_id") &&
          col("ts") >= col("err_ts") &&
          col("ts") <= col("err_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
        joinType)
      .select(col("err_id"), col("click_id"), col("user_id"),
        col("ts"), col("err_ts"))
  }

  /** Watermarked tumbling-window aggregation over the event stream. */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  // --- stateful sessionization -------------------------------------------

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long, value: Double)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      n_events: Long, session_value: Double, duration_secs: Long)

  val SessionGapMs: Long = 30 * 60 * 1000

  /** Gap-based sessionization with explicit state — the streaming form of
    * the batch `events_sessionize` query. A session closes when a later
    * event arrives past the gap; with `idleTimeout` also after 30 min of
    * processing-time inactivity (leave off for deterministic tests —
    * timeout batches fire on the wall clock, which `processAllAvailable`
    * does not drive). */
  def sessionize(events: Dataset[Event], idleTimeout: Boolean = true): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new java.sql.Timestamp(s.start),
              s.nEvents, s.value, (s.lastSeen - s.start) / 1000))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= SessionGapMs =>
                  cur = Some(s.copy(lastSeen = t, nEvents = s.nEvents + 1,
                    value = s.value + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, new java.sql.Timestamp(s.start),
                    s.nEvents, s.value, (s.lastSeen - s.start) / 1000)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (idleTimeout) state.setTimeoutDuration(SessionGapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
