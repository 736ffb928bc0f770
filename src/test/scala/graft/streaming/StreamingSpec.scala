package graft.streaming

import graft.SparkSpec
import graft.kg._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dims = Dims.tiny(spark)
  private def client = Inference.defaultClient(
    Dims.pinnedStrat.map(_.strat_name).toArray,
    Dims.gazetteer.map(_.name).toArray,
    Dims.pinnedMinerals.map(_.mineral).toArray)

  test("streaming triple extraction matches batch semantics per row") {
    val dir = java.nio.file.Files.createTempDirectory("pagestream").toString
    Pages.fixtures(spark).write.mode("overwrite").parquet(dir)

    val stream = StreamingKg.pagesStream(spark, dir)
    assert(stream.isStreaming)
    val q = StreamingKg.triplesStream(stream, dims, client)
      .writeStream.format("memory").queryName("triples_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val got = spark.table("triples_out")
      .filter(col("url") === "https://fixtures.graft/sauk")
      .select("subj_name", "predicate", "obj_name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Fixtures.SaukGoldenTriples)
    // alignment ran: canonical column exists and the long-form entity linked
    val shak = spark.table("triples_out")
      .filter(col("obj_name") === "Shakopee Formation").collect()
    assert(shak.forall(_.getAs[Boolean]("obj_linked")))
  }

  test("streaming hydration: streamed rows equal the batch pipeline's hydrated triples") {
    // The streamed output unit is the HYDRATED triplet with the batch
    // pipeline's exact schema (reference: text2graph/schema.py:441-447);
    // only global canonicalization is deferred to compaction, so the batch
    // comparator runs canonicalize = false.
    val dir = java.nio.file.Files.createTempDirectory("pagestreamhyd").toString
    Pages.fixtures(spark).write.mode("overwrite").parquet(dir)
    val q = StreamingKg.triplesStream(StreamingKg.pagesStream(spark, dir), dims, client)
      .writeStream.format("memory").queryName("triples_hyd_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("triples_hyd_out")
    assert(got.columns.toSeq === KgPipeline.TripleColumns)
    val batch = KgPipeline.run(spark, Pages.fixtures(spark), dims, client,
      KgPipeline.Config(numPartitions = 4, canonicalize = false)).triples
    val cols = Seq("url", "subj_name", "predicate", "obj_name", "obj_canonical",
      "obj_final", "obj_linked", "entity_cluster_id", "strat_name",
      "strat_name_long", "strat_name_id", "b_age", "t_age", "mineral",
      "formula", "lith", "subj_lat", "subj_lon")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(rows(got) === rows(batch))
  }

  test("snapshot sink: per-batch atomic commits, replayed batch is a no-op") {
    import graft.sources.SnapshotStore
    val pagesDir = java.nio.file.Files.createTempDirectory("snapsrc").toString
    val storeDir = java.nio.file.Files.createTempDirectory("snapsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("snapckpt").toString
    Pages.fixtures(spark).write.mode("overwrite").parquet(pagesDir)

    val stream = StreamingKg.pagesStream(spark, pagesDir)
    val q = StreamingKg.snapshotSink(
        StreamingKg.triplesStream(stream, dims, client), storeDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val v = SnapshotStore.currentVersion(spark, storeDir)
    assert(v >= 1)
    val committed = SnapshotStore.read(spark, storeDir, "triples").get
    assert(committed.filter(col("url") === "https://fixtures.graft/sauk").count() > 0)
    assert(SnapshotStore.readSnapshot(spark, storeDir, v).meta.contains("batch_id"))

    // replay semantics: re-committing an already-committed batch id skips
    val n1 = committed.count()
    val replayed = StreamingKg.commitBatch(storeDir, "triples",
      committed.limit(1), batchId = 0)
    assert(replayed.isEmpty)
    assert(SnapshotStore.read(spark, storeDir, "triples").get.count() === n1)
    // a NEW batch id commits and appends
    val next = StreamingKg.commitBatch(storeDir, "triples",
      committed.limit(1), batchId = 999)
    assert(next.contains(v + 1))
    assert(SnapshotStore.read(spark, storeDir, "triples").get.count() === n1 + 1)
  }

  test("streaming failure bookkeeping: failed urls commit atomically with triples") {
    import graft.sources.SnapshotStore
    val pagesDir = java.nio.file.Files.createTempDirectory("failsrc").toString
    val storeDir = java.nio.file.Files.createTempDirectory("failsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("failckpt").toString
    def page(u: String, t: String) =
      (u, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        HtmlText.render(t, "en"), t, "en")
    Seq(
      page("https://t/ok", "Shakopee Formation in Minnesota."),
      page("https://t/fail-infer", "Text one."),
      page("https://t/fail-parse", "Text two."))
      .toDF("url", "warc_ts", "html", "text", "lang")
      .write.mode("overwrite").parquet(pagesDir)
    graft.kg.HealToggle.healed = false
    val raw = StreamingKg.rawParsedStream(
      StreamingKg.pagesStream(spark, pagesDir), dims,
      new graft.kg.HealToggle.HealingClient)
    val sink = StreamingKg.snapshotSinkWithFailures(raw, storeDir, dims)
    try {
      val q = sink.writer
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    } finally sink.release()

    // one atomic snapshot carries BOTH tables
    val failed = SnapshotStore.read(spark, storeDir, "failed").get
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(failed === Map(
      "https://t/fail-infer" -> "infer", "https://t/fail-parse" -> "parse"))
    val triples = SnapshotStore.read(spark, storeDir, "triples").get
    assert(triples.columns.toSeq === KgPipeline.TripleColumns)
    assert(triples.select("url").collect().map(_.getString(0)).toSet ===
      Set("https://t/ok"))
    // replay protection covers the multi-table commit too
    val v = SnapshotStore.currentVersion(spark, storeDir)
    assert(StreamingKg.commitBatchTables(storeDir,
      Map("triples" -> triples.limit(1)), batchId = 0).isEmpty)
    assert(SnapshotStore.currentVersion(spark, storeDir) === v)
  }

  test("failed-url re-drive: healed transport converges the store and empties the log") {
    import graft.sources.SnapshotStore
    val pagesDir = java.nio.file.Files.createTempDirectory("redrivesrc").toString
    val storeDir = java.nio.file.Files.createTempDirectory("redrivesink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("redriveckpt").toString
    def page(u: String, t: String) =
      (u, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        HtmlText.render(t, "en"), t, "en")
    val pagesDf = Seq(
      page("https://t/ok", "Shakopee Formation in Minnesota."),
      page("https://t/fail-infer", "Text one."),
      page("https://t/fail-parse", "Text two."))
      .toDF("url", "warc_ts", "html", "text", "lang")
    pagesDf.write.mode("overwrite").parquet(pagesDir)
    // 1. stream with a DOWN transport: 2 pages land in the failure log
    graft.kg.HealToggle.healed = false
    val raw = StreamingKg.rawParsedStream(
      StreamingKg.pagesStream(spark, pagesDir), dims,
      new graft.kg.HealToggle.HealingClient)
    val sink = StreamingKg.snapshotSinkWithFailures(raw, storeDir, dims)
    try {
      val q = sink.writer.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(60000))
    } finally sink.release()
    assert(SnapshotStore.read(spark, storeDir, "failed").get.count() === 2L)
    // 2. transport heals; first re-drive sees a corpus MISSING one failed
    //    page — that url's log row is carried, the other heals
    graft.kg.HealToggle.healed = true
    val partial = spark.read.parquet(pagesDir)
      .filter(col("url") =!= "https://t/fail-parse")
    val v1 = StreamingKg.redriveFailed(spark, storeDir, partial, dims,
      new graft.kg.HealToggle.HealingClient)
    assert(v1.nonEmpty)
    val logAfter1 = SnapshotStore.read(spark, storeDir, "failed").get
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(logAfter1 === Map("https://t/fail-parse" -> "parse"))
    // 3. second re-drive with the full corpus: the store CONVERGES to the
    //    all-healthy run's triples and the failure log is EMPTY
    val v2 = StreamingKg.redriveFailed(spark, storeDir,
      spark.read.parquet(pagesDir), dims, new graft.kg.HealToggle.HealingClient)
    assert(v2.nonEmpty)
    val healthy = KgPipeline.run(spark, spark.read.parquet(pagesDir), dims,
      new graft.kg.HealToggle.HealingClient,
      KgPipeline.Config(numPartitions = 2, canonicalize = false)).triples
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(KgPipeline.TripleColumns.map(col): _*).collect().map(_.toSeq).toSet
    assert(rows(SnapshotStore.read(spark, storeDir, "triples").get) === rows(healthy))
    assert(SnapshotStore.read(spark, storeDir, "failed").forall(_.count() === 0L))
    // 4. with an empty log the job is a no-op (None — nothing to re-drive)
    assert(StreamingKg.redriveFailed(spark, storeDir,
      spark.read.parquet(pagesDir), dims,
      new graft.kg.HealToggle.HealingClient).isEmpty)
  }

  test("streaming alignment tiers: micro-batch fuzzy+cosine equal the batch pipeline") {
    import graft.sources.SnapshotStore
    val pagesDir = java.nio.file.Files.createTempDirectory("tiersrc").toString
    val storeDir = java.nio.file.Files.createTempDirectory("tiersink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("tierckpt").toString
    // dim knows only "Waldron Shale"; tier-1 misses the misspelling, the
    // cosine tier links it (sim 0.859 >= 0.8) — inside a micro-batch
    val text = "The Waldron Shael is exposed near Minnesota."
    Seq(("https://t/tier-stream",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        HtmlText.render(text, "en"), text, "en"))
      .toDF("url", "warc_ts", "html", "text", "lang")
      .write.mode("overwrite").parquet(pagesDir)
    def tierClient = Inference.defaultClient(
      Dims.pinnedStrat.map(_.strat_name).toArray :+ "Waldron Shael",
      Dims.gazetteer.map(_.name).toArray, Array())
    val raw = StreamingKg.rawParsedStream(
      StreamingKg.pagesStream(spark, pagesDir), dims, tierClient)
    val sink = StreamingKg.snapshotSinkWithFailures(raw, storeDir, dims,
      cosineMinSim = Some(0.8))
    try {
      val q = sink.writer
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(60000), "streaming query did not finish in 60 s")
    } finally sink.release()
    val streamed = SnapshotStore.read(spark, storeDir, "triples").get
    val on = streamed.filter(col("obj_name") === "Waldron Shael").collect().head
    assert(on.getAs[Boolean]("obj_linked"))
    assert(on.getAs[String]("obj_final") === "Waldron Shale")
    assert(on.getAs[Long]("strat_name_id") === 4260L)
    // exact parity with the batch pipeline on the same pages: the tiers
    // are per-name functions of the static dictionary, so micro-batch
    // scoping is semantics-free (canonicalization stays in compaction)
    val batch = KgPipeline.run(spark,
      spark.read.parquet(pagesDir), dims, tierClient,
      KgPipeline.Config(numPartitions = 2, canonicalize = false,
        cosineAlignMinSim = Some(0.8))).triples
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(KgPipeline.TripleColumns.map(col): _*).collect().map(_.toSeq).toSet
    assert(rows(streamed) === rows(batch))
  }

  test("compaction: cross-batch surface variants collapse to one canonical entity") {
    import graft.sources.SnapshotStore
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    def aligned(url: String, name: String) = Seq(
      (url, "h", "m", "Minnesota", "contains", name, "strat", name, false))
      .toDF("url", "hashed_text", "model_id", "subj_name", "predicate",
        "obj_name", "obj_kind", "obj_canonical", "obj_linked")
    // two micro-batches carry dictionary-UNKNOWN variants of one entity —
    // per-batch alignment cannot unify them, only global CC can
    StreamingKg.commitBatch(dir, "triples", aligned("u1", "Foo Formation"), 0)
    StreamingKg.commitBatch(dir, "triples", aligned("u2", "foo formation."), 1)
    val before = SnapshotStore.read(spark, dir, "triples").get

    val v = StreamingKg.compactCanonicalize(spark, dir)
    assert(v.contains(3))
    val after = SnapshotStore.read(spark, dir, "triples").get
    // schema-stable rewrite: canonicalization folds into obj_canonical, the
    // column set never drifts from the stream's append schema
    assert(after.columns.toSeq === before.columns.toSeq)
    val canon = after.select("obj_name", "obj_canonical").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(canon("Foo Formation") === "Foo Formation")
    assert(canon("foo formation.") === "Foo Formation")
    // the batch_id watermark survives the replace-mode commit: a restarted
    // query replaying its last micro-batch must still be skipped
    assert(SnapshotStore.readSnapshot(spark, dir, 3).meta.get("batch_id")
      .contains("1"))
    assert(StreamingKg.commitBatch(dir, "triples", aligned("u2", "foo formation."), 1).isEmpty)
    // and later micro-batches append the same schema readably
    StreamingKg.commitBatch(dir, "triples", aligned("u3", "FOO formation"), 2)
    val mixed = SnapshotStore.read(spark, dir, "triples").get
    assert(mixed.columns.toSeq === before.columns.toSeq && mixed.count() === 3)
    // time travel: the pre-compaction version is still readable, uncompacted
    val old = SnapshotStore.read(spark, dir, "triples", Some(2)).get
    assert(old.count() === 2)
    assert(old.filter(col("obj_canonical") === "foo formation.").count() === 1)
  }

  test("cross-shard dedup compaction: sharded runs + compactDedup equal one dedup-gated run") {
    import graft.sources.SnapshotStore
    // Near-dup CHAIN A ~ X ~ B (adjacent Jaccard 0.6 ≥ 0.5; J(A,B) = 1/3 —
    // connected only through the bridge X) + unique C. Filler words were
    // chosen so both adjacent pairs share a MinHash band deterministically
    // (md5-seeded signatures, so candidate generation is reproducible).
    val tA = "Shakopee Formation is found in Minnesota cobalt dolomite halite quebec basalt sierra"
    val tX = "Shakopee Formation is found in Minnesota quebec basalt sierra golf foxtrot zulu"
    val tB = "Shakopee Formation is found in Minnesota golf foxtrot zulu emerald papa uniform"
    val tC = "Powell Dolomite underlies the river bluffs near Minnesota today entirely"
    // Role assignment at runtime from the deterministic hashes: A = global
    // min doc_id (the cluster winner everywhere), X = the bridge sharing
    // A's shard (and LOSING its within-shard dedup: doc_id(X) > doc_id(A)),
    // B in a DIFFERENT shard — so the sharded gates never see the A~X~B
    // chain whole, and only through the bridge X (already dropped in shard
    // 1) does the global pass know B duplicates A.
    val pool = (0 until 24).map(i => s"https://t/compact/$i")
    val info = pool.map { u =>
      val r = Seq(u).toDF("u")
        .select(KgPipeline.urlBucket(col("u")), xxhash64(col("u")))
        .collect().head
      (u, r.getLong(0), r.getLong(1))
    }.sortBy(_._3)
    val (uA, bA, _) = info(0)
    val (uX, bX, _) = info(1)
    val (uB, _, _) = info.drop(2).find(t => t._2 != bA && t._2 != bX).get
    val uC = info.drop(2).find(t => t._1 != uB).get._1
    val shard1 = Seq(bA, bX).distinct.map(_.toInt)
    val shard2 = (0 until 64).filterNot(shard1.contains)
    def page(u: String, t: String) =
      (u, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        HtmlText.render(t, "en"), t, "en")
    val pages = Seq(page(uA, tA), page(uX, tX), page(uB, tB), page(uC, tC))
      .toDF("url", "warc_ts", "html", "text", "lang")
    val full = java.nio.file.Files.createTempDirectory("dedupfull").toString
    val shard = java.nio.file.Files.createTempDirectory("dedupshard").toString
    val cfg = KgPipeline.Config(numPartitions = 2, canonicalize = false,
      dedupMinJaccard = Some(0.5))
    KgPipeline.runAndCommitSnapshot(spark, pages, dims, client, full, cfg)
    KgPipeline.runAndCommitSnapshot(spark, pages, dims, client, shard,
      cfg.copy(buckets = Some(shard1)))
    KgPipeline.runAndCommitSnapshot(spark, pages, dims, client, shard,
      cfg.copy(buckets = Some(shard2)))
    def urls(dir: String) = SnapshotStore.read(spark, dir, "triples").get
      .select("url").distinct().collect().map(_.getString(0)).toSet
    // the documented gap is REAL pre-compaction: B survives its shard (its
    // duplicate cluster spans shards), while the unsharded gate dropped it
    assert(urls(full) === Set(uA, uC))
    assert(urls(shard) === Set(uA, uB, uC))
    // global compaction over the SAME corpus closes it
    val v = StreamingKg.compactDedup(spark, shard,
      pages.select("url", "text"), minJaccard = 0.5)
    assert(v.nonEmpty)
    def rows(dir: String) = SnapshotStore.read(spark, dir, "triples").get
      .select("url", "subj_name", "predicate", "obj_name", "obj_final")
      .collect().map(_.toSeq).toSet
    assert(rows(shard) === rows(full))
    // meta + lineage record the drop
    val snap = SnapshotStore.readSnapshot(spark, shard, v.get)
    assert(snap.meta.get("compaction").contains("dedup"))
    assert(snap.meta.get("dedup_dropped_urls").contains("1"))
    assert(snap.meta("dedup_dropped_triples").toLong > 0L)
    val lin = SnapshotStore.read(spark, shard, "lineage").get
      .filter(col("stage") === "compact_dedup").collect()
    assert(lin.length === 1)
    assert(lin.head.getAs[Long]("failed_rows") ===
      snap.meta("dedup_dropped_triples").toLong)
    // done is untouched: duplicates were PROCESSED — never re-drive them
    assert(SnapshotStore.read(spark, shard, "done").get
      .select("url").distinct().count() === 4L)
    // idempotent: a second compaction over the same corpus drops nothing
    val v2 = StreamingKg.compactDedup(spark, shard,
      pages.select("url", "text"), minJaccard = 0.5)
    assert(SnapshotStore.readSnapshot(spark, shard, v2.get)
      .meta("dedup_dropped_triples") === "0")
    assert(rows(shard) === rows(full))
  }

  test("compaction re-hydration preserves each row's original requested_at provenance") {
    import graft.sources.SnapshotStore
    val dir = java.nio.file.Files.createTempDirectory("compactprov").toString
    // rows committed by an earlier run carry THAT run's timestamp...
    val t1 = java.sql.Timestamp.valueOf("2023-03-03 03:03:03")
    val committed = KgPipeline.run(spark, Pages.fixtures(spark), dims, client,
      KgPipeline.Config(numPartitions = 2, canonicalize = false, jobStart = t1))
      .triples.select(KgPipeline.TripleColumns.map(col): _*)
    StreamingKg.commitBatch(dir, "triples", committed, 0)
    // ...and a LATER compaction that re-hydrates (dims supplied) with its
    // own jobStart must not restamp them: requested_at and every
    // provenance-hop timestamp keep the original run's value (ADVICE r5)
    val t2 = java.sql.Timestamp.valueOf("2025-05-05 05:05:05")
    StreamingKg.compactCanonicalize(spark, dir, dims = Some(dims), jobStart = t2)
    val after = SnapshotStore.read(spark, dir, "triples").get
    assert(after.columns.toSeq === KgPipeline.TripleColumns)
    assert(after.count() === committed.count())
    val stamps = after.select(col("requested_at"),
        expr("transform(provenance, h -> h.requested)").as("hops"))
      .collect()
    assert(stamps.nonEmpty)
    stamps.foreach { r =>
      assert(r.getTimestamp(0) === t1)
      r.getSeq[java.sql.Timestamp](1).foreach(h => assert(h === t1))
    }
    // hydration columns survived the round trip (joined on the same names)
    val shak = after.filter(col("obj_name") === "Shakopee Formation").collect()
    assert(shak.nonEmpty && shak.forall(_.getAs[Long]("strat_name_id") === 1278L))
  }

  test("watermarked windowed aggregation over an event stream") {
    val input = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = StreamingKg.windowedEventCounts(events)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    input.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:07:00"), "view", 5.0))
    q.processAllAvailable()
    val rows = spark.table("win_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows === Set(
      ("2024-01-01 00:00:00.0", "click", 2L),
      ("2024-01-01 00:05:00.0", "view", 1L)))
  }

  test("dedup gate inside triplesStream: identical page spends inference once") {
    val dir = java.nio.file.Files.createTempDirectory("pagestreamdedup").toString
    val pages = Pages.fixtures(spark)
    pages.unionByName(
        pages.filter(col("url") === "https://fixtures.graft/sauk")
          .withColumn("url", lit("https://fixtures.graft/sauk-copy")))
      .write.mode("overwrite").parquet(dir)
    val q = StreamingKg.triplesStream(StreamingKg.pagesStream(spark, dir),
        dims, client, dedupWatermark = Some("1 hour"))
      .writeStream.format("memory").queryName("triples_dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val urls = spark.table("triples_dedup_out").select("url").distinct()
      .collect().map(_.getString(0)).toSet
    assert(urls.count(Set("https://fixtures.graft/sauk",
      "https://fixtures.graft/sauk-copy")) === 1)
  }

  test("streaming page dedup: re-fetched identical pages drop cross-batch") {
    def t(m: String) = java.sql.Timestamp.valueOf(m)
    val input = MemoryStream[(String, java.sql.Timestamp, String)](spark)
    val pages = input.toDF().toDF("url", "warc_ts", "text")
      .withColumn("hashed_text", sha2(col("text"), 256))
    val q = StreamingKg.dedupPagesStream(pages)
      .writeStream.format("memory").queryName("pagededup_out")
      .outputMode("append").start()
    input.addData(("u1", t("2024-01-01 00:00:00"), "same text"),
      ("u2", t("2024-01-01 00:01:00"), "other text"))
    q.processAllAvailable()
    // the crawl re-fetches identical content under a new url, later batch
    input.addData(("u3", t("2024-01-01 00:05:00"), "same text"))
    q.processAllAvailable()
    val urls = spark.table("pagededup_out").select("url")
      .collect().map(_.getString(0)).sorted.toSeq
    q.stop()
    assert(urls === Seq("u1", "u2"))
  }

  test("watermarked dedup drops cross-batch duplicate event ids") {
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val events = input.toDF().toDF("event_id", "ts", "value")
    val q = StreamingKg.dedupEvents(events)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    input.addData((1L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 2.0))
    q.processAllAvailable()
    // the same event id replays in a later micro-batch (at-least-once feed)
    input.addData((1L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 1.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), 3.0))
    q.processAllAvailable()
    val ids = spark.table("dedup_out").collect().map(_.getLong(0)).sorted
    q.stop()
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("stream-stream join equals the batch range join; watermark bounds state") {
    def t(m: String) = java.sql.Timestamp.valueOf(m)
    val clickIn = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val errIn = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val q = StreamingKg.clicksAfterErrors(
        clickIn.toDF().toDF("event_id", "user_id", "ts"),
        errIn.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    // batch 1: one error, clicks inside/outside its window, one other user
    errIn.addData((100L, 1L, t("2024-01-01 00:00:00")))
    clickIn.addData((1L, 1L, t("2024-01-01 00:05:00")),
      (2L, 1L, t("2024-01-01 00:15:00")), (3L, 2L, t("2024-01-01 00:05:00")))
    q.processAllAvailable()
    // batch 2: a cross-batch match against the buffered error + a new pair
    clickIn.addData((4L, 1L, t("2024-01-01 00:08:00")))
    errIn.addData((101L, 2L, t("2024-01-01 00:30:00")))
    clickIn.addData((5L, 2L, t("2024-01-01 00:31:00")))
    q.processAllAvailable()
    // far-future events advance the watermark so old state is evictable
    errIn.addData((999L, 9L, t("2024-01-02 12:00:00")))
    clickIn.addData((99L, 9L, t("2024-01-02 12:00:00")))
    q.processAllAvailable()
    clickIn.addData((98L, 9L, t("2024-01-02 12:00:01")))
    q.processAllAvailable()
    val got = spark.table("ssj_out").select("err_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch oracle: the SAME data through ops.RangeJoin
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val allClicks = Seq((1L, 1L, t("2024-01-01 00:05:00")),
      (2L, 1L, t("2024-01-01 00:15:00")), (3L, 2L, t("2024-01-01 00:05:00")),
      (4L, 1L, t("2024-01-01 00:08:00")), (5L, 2L, t("2024-01-01 00:31:00")),
      (99L, 9L, t("2024-01-02 12:00:00")), (98L, 9L, t("2024-01-02 12:00:01")))
      .toDF("click_id", "user_id", "ts")
    val allErrors = Seq((100L, 1L, t("2024-01-01 00:00:00")),
      (101L, 2L, t("2024-01-01 00:30:00")), (999L, 9L, t("2024-01-02 12:00:00")))
      .toDF("err_id", "user_id", "w_start")
      .withColumn("w_end", col("w_start") + expr("INTERVAL 10 MINUTES"))
    val batch = graft.ops.RangeJoin.pointsInRanges(allClicks, allErrors,
        key = "user_id", ptsCol = "ts", startCol = "w_start", endCol = "w_end",
        binSeconds = 600)
      .select("err_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === batch)
    assert(got.contains((100L, 4L))) // the cross-micro-batch match happened
    // bounded state: the day-old clicks/errors were evicted by the
    // watermark — only the recent horizon remains buffered
    val st = q.lastProgress.stateOperators
    assert(st.nonEmpty && st.head.numRowsTotal < 10,
      s"state not bounded: ${st.map(_.numRowsTotal).mkString(",")}")
    q.stop()
  }

  test("left-outer stream-stream join: unmatched clicks emit nulls after the watermark") {
    def t(m: String) = java.sql.Timestamp.valueOf(m)
    val clickIn = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val errIn = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val q = StreamingKg.clicksAfterErrors(
        clickIn.toDF().toDF("event_id", "user_id", "ts"),
        errIn.toDF().toDF("event_id", "user_id", "ts"),
        joinType = "left_outer")
      .writeStream.format("memory").queryName("ssj_outer_out")
      .outputMode("append").start()
    // click 1 matches; click 2 has no error in its user's window
    errIn.addData((100L, 1L, t("2024-01-01 00:00:00")))
    clickIn.addData((1L, 1L, t("2024-01-01 00:05:00")),
      (2L, 2L, t("2024-01-01 00:05:00")))
    q.processAllAvailable()
    // advance the watermark well past click 2's match horizon, then let a
    // further batch run the state-eviction pass that emits the null row
    clickIn.addData((50L, 5L, t("2024-01-01 06:00:00")))
    errIn.addData((500L, 5L, t("2024-01-01 06:00:00")))
    q.processAllAvailable()
    clickIn.addData((51L, 5L, t("2024-01-01 06:00:01")))
    q.processAllAvailable()
    val rows = spark.table("ssj_outer_out")
      .select("err_id", "click_id").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getLong(1)).toSet
    q.stop()
    assert(rows.contains((100L, 1L)))  // matched click joined normally
    assert(rows.contains((-1L, 2L)),   // unmatched click emitted with null
      s"no null-padded row for click 2 in $rows")
  }

  test("stateful sessionization closes sessions on gap") {
    val input = MemoryStream[StreamingKg.Event](spark)
    val q = StreamingKg.sessionize(input.toDS(), idleTimeout = false)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    // two sessions for user 1 separated by > 30 min; the second stays open
    input.addData(
      StreamingKg.Event(1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      StreamingKg.Event(1, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 2.0),
      StreamingKg.Event(1, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 4.0))
    q.processAllAvailable()
    val closed = spark.table("sess_out").as[StreamingKg.SessionOut].collect()
    q.stop()
    assert(closed.length === 1)
    assert(closed.head.n_events === 2)
    assert(closed.head.session_value === 3.0)
    assert(closed.head.duration_secs === 600)
  }
}
