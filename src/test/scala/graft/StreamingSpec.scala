package graft

import graft.streaming.StreamingOps

/** Structured Streaming forms must agree with their batch equivalents when
  * the stream is a bounded parquet directory (no late data). */
class StreamingSpec extends SparkTestBase {

  test("streaming tumbling window agg matches the batch q24 result") {
    // complete mode: append would (correctly) hold back windows newer than
    // the final watermark; for a bounded input we want full equality
    val stream = StreamingOps.eventsStream(spark, sfDir)
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.tumblingCounts(stream), "tumbling_test", "complete")
    val want = operators.EventOps.q24Tumbling(spark, sfDir)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("stream-stream interval join matches the batch formulation") {
    import org.apache.spark.sql.functions._
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.purchaseViewJoin(
        StreamingOps.eventsStream(spark, sfDir),
        StreamingOps.eventsStream(spark, sfDir)), "ssjoin_test")
    val e = Tables.events(spark, sfDir)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val want = p.join(v, expr(
      "p_user = v_user AND v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("view_id"), col("p_ts"), col("v_ts"))
    assert(want.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming session windows match the batch session_window counts") {
    import org.apache.spark.sql.functions._
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.sessionCounts(StreamingOps.eventsStream(spark, sfDir)),
      "sessions_test", "complete")
    val want = Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("foreachBatch lake sink converges to the batch aggregation") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("slake").toString + "/counts"
    val agg = StreamingOps.tumblingCounts(StreamingOps.eventsStream(spark, sfDir))
      .withColumn("part_hour", date_format(col("ts_hour"), "yyyyMMddHH"))
    StreamingOps.runToLake(spark, agg, out, "part_hour",
      Seq("ts_hour", "event_type"))
    val got = spark.read.parquet(out)
      .select("ts_hour", "event_type", "n", "sum_value")
    val want = operators.EventOps.q24Tumbling(spark, sfDir)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // hive layout on disk (the pruning key downstream readers use)
    assert(new java.io.File(out).listFiles()
      .exists(_.getName.startsWith("part_hour=")))
  }

  test("lake sink merges partitions across MULTIPLE micro-batches") {
    // the single-batch test above can't catch partition-wipe bugs: with all
    // input in one trigger every group of every partition is in the batch.
    // Here the input is split into 6 files streamed one per trigger
    // (maxFilesPerTrigger=1), so later batches update SOME groups of an
    // hour partition while others must survive from earlier batches.
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("slake_multi").toString
    val chunks = s"$tmp/chunks"
    val events = Tables.events(spark, sfDir)
    // separate write calls → separate files (mtimes strictly ordered is not
    // required: the aggregation below carries no watermark, so no trigger
    // order drops rows)
    (0 until 6).foreach { i =>
      events.filter(pmod(col("event_id"), lit(6)) === i)
        .coalesce(1).write.mode("append").parquet(chunks)
    }
    val schema = spark.read.parquet(chunks).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(chunks)
    val agg = stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ts_hour"), col("event_type"), col("n"))
      .withColumn("part_hour", date_format(col("ts_hour"), "yyyyMMddHH"))
    val out = s"$tmp/counts"
    val nBatches = StreamingOps.runToLake(spark, agg, out, "part_hour",
      Seq("ts_hour", "event_type"))
    assert(nBatches >= 6, s"expected one micro-batch per file, got $nBatches")
    val got = spark.read.parquet(out).select("ts_hour", "event_type", "n")
    val want = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ts_hour"), col("event_type"), col("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("lake sink resumes from its checkpoint: a restart reads only new files") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("slake_resume").toString
    val chunks = s"$tmp/chunks"
    val ckpt = s"$tmp/ckpt"
    val out = s"$tmp/counts"
    val events = Tables.events(spark, sfDir)
    def writeChunk(i: Int): Unit =
      events.filter(pmod(col("event_id"), lit(5)) === i)
        .coalesce(1).write.mode("append").parquet(chunks)
    def agg(stream: org.apache.spark.sql.DataFrame) = stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ts_hour"), col("event_type"), col("n"))
      .withColumn("part_hour", date_format(col("ts_hour"), "yyyyMMddHH"))
    def run(): Long = {
      val schema = spark.read.parquet(chunks).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(chunks)
      StreamingOps.runToLake(spark, agg(stream), out, "part_hour",
        Seq("ts_hour", "event_type"), Some(ckpt))
    }
    (0 until 3).foreach(writeChunk)
    val first = run()
    assert(first >= 3, s"expected >=3 micro-batches, got $first")
    // restart over the same checkpoint with two NEW files: only they run
    writeChunk(3); writeChunk(4)
    val second = run()
    assert(second <= 2, s"restart reprocessed old files: $second batches")
    // the lake converges to the full batch aggregation
    val got = spark.read.parquet(out).select("ts_hour", "event_type", "n")
    val want = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ts_hour"), col("event_type"), col("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming curation equals batch curation (redact + filter + exact dedup)") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    val tmp = java.nio.file.Files.createTempDirectory("scurate").toString
    val src = s"$tmp/src"
    // several files so dedup state must carry across micro-batches
    val docs = Tables.documents(spark, sfDir)
    (0 until 4).foreach { i =>
      docs.filter(pmod(col("doc_id"), lit(4)) === i)
        .coalesce(1).write.mode("append").parquet(src)
    }
    val out = s"$tmp/curated"
    StreamingOps.runAppendToLake(spark,
      StreamingOps.curatedDocsStream(spark, src, filesPerTrigger = 1),
      out, s"$tmp/ckpt")
    val got = spark.read.parquet(out)
    val want = docs
      .withColumn("text", operators.CurationOps.redact(col("text")))
      .filter(size(TextFns.tokens(col("text"))) >= 3)
      .withColumn("fp", md5(TextFns.normText(col("text"))))
    // one surviving row per fingerprint; same fingerprint set as batch
    assert(got.count() == want.select("fp").distinct().count())
    assert(got.select("fp").exceptAll(want.select("fp").distinct()).isEmpty)
    // redaction really ran in-stream
    assert(got.filter(col("text").rlike(
      "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}")).count() == 0L)
  }

  test("stream-static mixture join: streamed sample equals the batch q88 result") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("smix").toString
    val src = s"$tmp/src"
    val docs = Tables.documents(spark, sfDir)
    (0 until 3).foreach { i =>
      docs.filter(pmod(col("doc_id"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(src)
    }
    val out = s"$tmp/sampled"
    StreamingOps.runAppendToLake(spark,
      StreamingOps.mixtureSampledStream(spark, src, sfDir, filesPerTrigger = 1),
      out, s"$tmp/ckpt")
    val got = spark.read.parquet(out).select("doc_id", "lang", "rate_pm")
    val want = operators.CurationOps.q88DomainMixture(spark, sfDir)
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming phrase match equals batch phrase search, stateless") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("sphrase").toString
    val src = s"$tmp/src"
    val docs = Tables.documents(spark, sfDir)
    (0 until 3).foreach { i =>
      docs.filter(pmod(col("doc_id"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(src)
    }
    val phrases = Seq("table scan merge", "big order scan",
      "stream spark window", "sort merge join", "hash join order")
    val streamed = StreamingOps.phraseMatchStream(spark, src, phrases,
      filesPerTrigger = 1)
    // stateless: no state store operators in the streaming plan
    val out = s"$tmp/hits"
    StreamingOps.runAppendToLake(spark, streamed, out, s"$tmp/ckpt")
    val got = spark.read.parquet(out).select("phrase", "doc_id", "n_hits")
    val want = operators.TextOps.phraseSearch(docs, phrases)
      .select("phrase", "doc_id", "n_hits")
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming ingest chunking equals batch chunkDocs, stateless") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("schunk").toString
    val src = s"$tmp/src"
    val docs = Tables.documents(spark, sfDir)
    (0 until 3).foreach { i =>
      docs.filter(pmod(col("doc_id"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(src)
    }
    val streamed = StreamingOps.chunkDocsStream(spark, src, maxTokens = 40,
      filesPerTrigger = 1)
    val out = s"$tmp/chunks"
    StreamingOps.runAppendToLake(spark, streamed, out, s"$tmp/ckpt")
    val got = spark.read.parquet(out)
    val want = operators.CurationOps.chunkDocs(
      spark.read.parquet(src), maxTokens = 40)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming triage equals batch ingest triage for id-ordered arrival") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    val tmp = java.nio.file.Files.createTempDirectory("striage").toString
    val src = s"$tmp/src"
    val docs = Tables.documents(spark, sfDir)
    val isOld = pmod(TextFns.hash60(
      concat(lit("old:"), col("doc_id").cast("string"))), lit(10L)) < 7L
    val corpusFps = docs.filter(isOld)
      .select(md5(TextFns.normText(col("text"))).as("fp"))
    val feedDocs = docs.filter(!isOld)
    // three files in ascending doc_id ranges, so arrival order == id order
    val ids = feedDocs.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0))
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    Seq(col("doc_id") < cuts(0),
      col("doc_id") >= cuts(0) && col("doc_id") < cuts(1),
      col("doc_id") >= cuts(1)).foreach { p =>
      feedDocs.filter(p).coalesce(1).write.mode("append").parquet(src)
    }
    val out = s"$tmp/triaged"
    StreamingOps.runAppendToLake(spark,
      StreamingOps.triageStream(spark, src, corpusFps, filesPerTrigger = 1),
      out, s"$tmp/ckpt")
    val got = spark.read.parquet(out)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val want = operators.DedupOps.q140IngestTriage(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("incremental packing across triggers equals the batch q87 packer") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("spack").toString
    val src = s"$tmp/src"
    val items = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(4L)).as("shard"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long")
          .as("n_tok"))
    // three ascending doc_id ranges written sequentially: per-shard
    // delivery order == batch packing order
    val maxId = items.agg(max("doc_id")).head().getLong(0)
    val cut1 = maxId / 3; val cut2 = 2 * maxId / 3
    Seq(col("doc_id") <= cut1,
      col("doc_id") > cut1 && col("doc_id") <= cut2,
      col("doc_id") > cut2).foreach { p =>
      items.filter(p).coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(5) // distinct file timestamps fix the delivery order
    }
    val out = s"$tmp/packed"
    StreamingOps.runAppendToLake(spark,
      StreamingOps.packingStream(spark, src), out, s"$tmp/ckpt")
    val got = spark.read.parquet(out).select("doc_id", "shard", "bin", "fill")
    val want = operators.CurationOps.q87PackSequences(spark, sfDir)
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("watermarked curation evicts dedup state: old fp re-admitted, fresh dup dropped") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("swm").toString
    val src = s"$tmp/src"
    val h = 3600L * 1000000L // one hour in µs
    def feed(rows: (Long, Long, String)*): Unit = {
      rows.toSeq.toDF("doc_id", "ingest_us", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("feed"))
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(5) // distinct file mtimes fix trigger order
    }
    val dup = "alpha beta gamma delta"
    // trigger 1: first occurrence at 10:00 (state expires at 12:00)
    feed((1L, 10 * h, dup))
    // trigger 2: dup at 11:00 — inside the 2h horizon -> dropped; the
    // 20:00 doc advances the watermark to 18:00 for the NEXT trigger
    feed((2L, 11 * h, dup), (3L, 20 * h, "other tokens arriving now"))
    // trigger 3: runs under wm=18:00 — its end-of-batch cleanup evicts
    // the 10:00 fingerprint (cleanup happens AFTER processing, so the
    // re-post must come one trigger later)
    feed((5L, 21 * h, "more unique filler text here"))
    // trigger 4: same content again at 19:30 (not late vs wm=19:00) —
    // state is gone -> re-admitted
    feed((4L, 19 * h + h / 2, dup))
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.curatedDocsStreamWatermarked(spark, src,
        timestamp_micros(col("ingest_us")), horizon = "2 hours",
        filesPerTrigger = 1), "wm_curate")
    val ids = got.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L, 5L, 4L), s"got $ids")
  }

  test("streaming per-source cap admits first k per source, one counter of state") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("scap").toString
    val src = s"$tmp/src"
    // three files delivered in order; sources interleave across files
    val chunks = Seq(
      Seq((1L, "a"), (2L, "b"), (3L, "a")),
      Seq((4L, "a"), (5L, "b"), (6L, "c")),
      Seq((7L, "a"), (8L, "b"), (9L, "c")))
    chunks.foreach { rows =>
      rows.toDF("doc_id", "source").coalesce(1)
        .write.mode("append").parquet(src)
      Thread.sleep(5) // distinct mtimes fix trigger order
    }
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.sourceCapStream(spark, src, k = 2), "cap_stream")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // first-2-in-arrival-order per source over the whole stream lifetime:
    // a admits 1,3 (file 1 fills its quota); b admits 2,5; c admits 6,9
    assert(got == Set((1L, "a"), (3L, "a"), (2L, "b"), (5L, "b"),
      (6L, "c"), (9L, "c")), got)
  }

  test("streaming CDC upsert view equals the batch fold; stale changes dropped") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("supsert").toString
    val src = s"$tmp/src"
    // (k, seq, op, payload) in three delivery files; key 2 is deleted then
    // receives a STALE update (seq 3 < 5) that must not resurrect it; key 3
    // receives an in-trigger out-of-order pair that must apply in seq order
    val chunks = Seq(
      Seq((1L, 1L, "I", "a1"), (2L, 2L, "I", "b1")),
      Seq((2L, 5L, "D", null: String), (3L, 7L, "U", "c2"), (3L, 6L, "I", "c1")),
      Seq((2L, 3L, "U", "b2"), (1L, 9L, "U", "a2")))
    chunks.foreach { rows =>
      rows.toDF("k", "seq", "op", "payload").coalesce(1)
        .write.mode("append").parquet(src)
      Thread.sleep(5)
    }
    val emitted = StreamingOps.runToMemory(spark,
      StreamingOps.upsertStream(spark, src), "upsert_stream", "update")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) null else r.getString(3)))
    // the latest emission per key is the materialized view
    val view = emitted.groupBy(_._1).map { case (_, es) => es.maxBy(_._2) }
      .filterNot(_._3).map(e => e._1 -> e._4).toMap
    // batch fold reference: max-seq change wins, deletes remove the key
    val all = chunks.flatten
    val ref = all.groupBy(_._1).flatMap { case (k, cs) =>
      val last = cs.maxBy(_._2)
      if (last._3 == "D") None else Some(k -> last._4)
    }
    assert(view == ref, s"view=$view ref=$ref")
    // the stale key-2 update produced NO emission (state seq unchanged)
    assert(!emitted.exists(e => e._1 == 2L && e._2 == 3L))
    // key 3's in-trigger pair applied in seq order: final payload c2 at seq 7
    assert(emitted.filter(_._1 == 3L).maxBy(_._2)._4 == "c2")
  }

  test("streaming token budget admits the first-arrival prefix per domain") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("stok").toString
    val src = s"$tmp/src"
    // budget 100/domain; langs interleave across three delivery files
    val chunks = Seq(
      Seq((1L, "en", 60L), (2L, "fr", 90L)),
      Seq((3L, "en", 30L), (4L, "fr", 50L), (5L, "en", 30L)),
      Seq((6L, "en", 10L), (7L, "fr", 10L)))
    chunks.foreach { rows =>
      rows.toDF("doc_id", "lang", "n_tokens").coalesce(1)
        .write.mode("append").parquet(src)
      Thread.sleep(5)
    }
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.tokenBudgetStream(spark, src, budgetPerDomain = 100L),
      "tok_budget")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // en: 60 → 90 → 120 (doc 5 admitted at before=90, crosses); doc 6 not
    // fr: 90 → 140 (doc 4 admitted at before=90, crosses); doc 7 not
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L), got)
    assert(got(5L) == 120L && got(4L) == 140L, got)
  }

  test("streaming transitions bridge trigger boundaries and drop late arrivals") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("strans").toString
    val src = s"$tmp/src"
    // (user_id, ts_us, event_id, event_type) over three delivery files;
    // user 1's b->c edge spans the file-1/file-2 trigger boundary, and
    // file 3 carries a LATE event (ts 15 < state ts 30) that must emit
    // nothing and leave the c->a edge intact
    val chunks = Seq(
      Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (2L, 10L, 3L, "x")),
      Seq((1L, 30L, 4L, "c"), (2L, 40L, 5L, "y")),
      Seq((1L, 15L, 6L, "late"), (1L, 50L, 7L, "a")))
    chunks.foreach { rows =>
      rows.toDF("user_id", "ts_us", "event_id", "event_type").coalesce(1)
        .write.mode("append").parquet(src)
      Thread.sleep(5)
    }
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.transitionStream(spark, src), "trans_stream")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = Seq(
      (1L, "a", "b"), (1L, "b", "c"), (1L, "c", "a"), (2L, "x", "y"))
    assert(got.sorted.toSeq == expected.sorted, got.toSeq)
    // aggregated pairs match the batch lead-window reference on the
    // same rows MINUS the dropped late event (the documented contract)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, lead}
    val all = chunks.flatten.filterNot(_._3 == 6L)
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val ref = all.withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("event_type"), col("to_type"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(p => p).view.mapValues(_.length).toMap
    val gotCounts = got.map(t => (t._2, t._3)).groupBy(p => p)
      .view.mapValues(_.length).toMap
    assert(gotCounts == ref)
  }

  test("streaming dedup emits each (user_id, event_id) once") {
    val stream = StreamingOps.eventsStream(spark, sfDir)
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.dedupStream(stream), "dedup_test")
    val n = Tables.events(spark, sfDir)
      .select("user_id", "event_id").distinct().count()
    assert(got.count() == n)
  }

  test("streaming covariance moments converge to the batch aggregate") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val chunks = java.nio.file.Files.createTempDirectory("scov").toString + "/e"
    val emb = Tables.embeddings(spark, sfDir)
    // three arrival chunks -> three micro-batches of state maintenance
    (0 until 3).foreach { i =>
      emb.filter(pmod(col("vec_id"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(chunks)
    }
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.covarianceStream(spark, chunks), "cov_stream", "complete")
    val want = emb
      .select(posexplode(
        graft.functions.VectorExprs.cov_pair_products(col("embedding")))
        .as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(DecimalType(38, 0))).as("sv"))
    assert(got.count() == 64 * 65 / 2 + 64)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("curated stream drops a low-diversity spam wall, keeps normal text") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("sdiv").toString
    val src = s"$tmp/src"
    Seq(
      (1L, "a perfectly ordinary sentence about engines and data", "en", "s0"),
      (2L, "x x x x x x x x x x x x x x x x x x x x x x x x", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(src)
    val out = s"$tmp/out"
    StreamingOps.runAppendToLake(spark,
      StreamingOps.curatedDocsStream(spark, src, filesPerTrigger = 1),
      out, s"$tmp/ckpt")
    val ids = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // doc 2 is "x"/" " only: coll_prob ≈ 0.5 > 0.2 → gated; doc 1 survives
    assert(ids == Set(1L), ids)
  }

  test("streaming JL projection equals batch q154 row-for-row") {
    val tmp = java.nio.file.Files.createTempDirectory("sproj").toString
    val src = s"$tmp/src"
    val e = Tables.embeddings(spark, sfDir)
    e.limit(40).coalesce(1).write.mode("append").parquet(src)
    e.exceptAll(e.limit(40)).coalesce(1).write.mode("append").parquet(src)
    val out = s"$tmp/proj"
    StreamingOps.runAppendToLake(spark,
      StreamingOps.projectionStream(spark, src, filesPerTrigger = 1),
      out, s"$tmp/ckpt")
    val got = spark.read.parquet(out)
    val want = operators.SimilarityOps.q154RandomProjection(spark, sfDir)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() == want.count() && got.count() > 0)
  }

  test("streaming chunk registry reproduces batch qm5 storage accounting") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("schunk").toString
    val src = s"$tmp/src"
    // two arrival files → the registry must carry state across triggers
    val docs = Tables.documents(spark, sfDir)
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(src)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(src)
    val out = s"$tmp/chunks"
    StreamingOps.runAppendToLake(spark,
      StreamingOps.chunkDedupStream(spark, src, filesPerTrigger = 1),
      out, s"$tmp/ckpt")
    val got = spark.read.parquet(out)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("stored"), 1L).otherwise(0L)).as("n_distinct"),
        sum(col("len")).as("bytes_total"),
        sum(when(col("stored"), col("len")).otherwise(0L)).as("bytes_stored"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val want = multimodal.Multimodal.qm5ChunkDedup(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("bytes_total"), r.getAs[Long]("bytes_stored")))).toMap
    assert(got == want && got.nonEmpty)
  }

  test("streaming attribution equals batch q152 for ts-ordered arrival") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val tmp = java.nio.file.Files.createTempDirectory("sattr").toString
    val src = s"$tmp/src"
    val ev = Tables.events(spark, sfDir)
      .withColumn("us", unix_micros(col("ts")))
    // three ascending ts ranges written sequentially: arrival order
    // respects event time, the contract attributionStream's state
    // eviction depends on (touches inside one file are unordered —
    // the in-batch sort covers those)
    val Array(c1, c2) =
      ev.stat.approxQuantile("us", Array(0.33, 0.66), 0.01).map(_.toLong)
    Seq(col("us") < c1, col("us") >= c1 && col("us") < c2,
      col("us") >= c2).foreach { p =>
      ev.filter(p).drop("us").coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(5) // distinct file timestamps fix delivery order
    }
    val out = s"$tmp/attr"
    StreamingOps.runAppendToLake(spark,
      StreamingOps.attributionStream(spark, src, filesPerTrigger = 1),
      out, s"$tmp/ckpt")
    val got = spark.read.parquet(out)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("w").cast(DecimalType(38, 0))).cast("long").as("w_mass"))
    val want = operators.EventOps.q152DecayAttribution(spark, sfDir)
      .select("channel", "n_touches", "w_mass")
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming KS monitor converges to the batch q176 drift value") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("sks").toString
    val src = s"$tmp/src"
    val docs = Tables.documents(spark, sfDir)
    val reference = docs.filter(col("source") === "src0")
    val feed = docs.filter(col("source") === "src1")
    // three ascending doc_id ranges arriving as separate files
    val maxId = feed.agg(max("doc_id")).head().getLong(0)
    val cut1 = maxId / 3; val cut2 = 2 * maxId / 3
    Seq(col("doc_id") <= cut1,
      col("doc_id") > cut1 && col("doc_id") <= cut2,
      col("doc_id") > cut2).foreach { p =>
      feed.filter(p).coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(5) // distinct file timestamps fix delivery order
    }
    val n = StreamingOps.ksMonitorStream(spark, src, reference,
      s"$tmp/state", s"$tmp/log", filesPerTrigger = 1)
    assert(n == 3L, s"expected 3 non-empty batches, got $n")
    val log = spark.read.parquet(s"$tmp/log").orderBy("batch_id").collect()
    assert(log.length == 3)
    // after the last batch the monitor has seen the whole feed: its D,
    // n_ref, n_stream must equal the batch operator's exactly
    val last = log.last
    val batchRow = operators.StatsOps.q176KsTest(spark, sfDir).head()
    assert(last.getAs[Long]("n_ref") == batchRow.getAs[Long]("n1"))
    assert(last.getAs[Long]("n_stream") == batchRow.getAs[Long]("n2"))
    assert(last.getAs[Double]("ks_d") == batchRow.getAs[Double]("ks_d"),
      s"stream ${last.getAs[Double]("ks_d")} != batch ${batchRow.getAs[Double]("ks_d")}")
    // intermediate batches monitor a partial feed: n_stream strictly grows
    assert(log.map(_.getAs[Long]("n_stream")).toSeq ==
      log.map(_.getAs[Long]("n_stream")).toSeq.sorted)
    // the mergeable state table is value-sized, not feed-sized
    val stateRows = spark.read.parquet(s"$tmp/state").count()
    assert(stateRows <= feed.select("n_chars").distinct().count())
  }

  test("streaming trimmed-mean monitor converges to batch q183 exactly") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("strim").toString
    val src = s"$tmp/src"
    val events = Tables.events(spark, sfDir)
    (0 until 4).foreach { i =>
      events.filter(pmod(col("event_id"), lit(4)) === i)
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(5)
    }
    val n = StreamingOps.trimmedMeanMonitorStream(spark, src,
      s"$tmp/state", s"$tmp/log", filesPerTrigger = 1)
    assert(n >= 4, s"expected >= 4 non-empty batches, got $n")
    val log = spark.read.parquet(s"$tmp/log")
    val lastId = log.agg(max(col("batch_id"))).head().getLong(0)
    val fin = log.filter(col("batch_id") === lastId)
      .select("event_type", "n", "trimmed_n", "trimmed_mean")
    val want = operators.StatsOps.q183TrimmedMean(spark, sfDir)
    assert(fin.exceptAll(want).isEmpty && want.exceptAll(fin).isEmpty)
    // monitored totals grow monotonically across triggers
    val perBatch = log.groupBy("batch_id").agg(sum(col("n")).as("tot"))
      .orderBy("batch_id").collect().map(_.getLong(1)).toSeq
    assert(perBatch == perBatch.sorted)
    // state stays value-sized, not event-sized
    assert(spark.read.parquet(s"$tmp/state").count() <=
      events.select(col("event_type"),
        graft.functions.Exact.cents(col("value"))).distinct().count())
  }

  test("streaming first-seen feed reproduces the batch q179 daily curve") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("snew").toString
    val src = s"$tmp/src"
    val events = Tables.events(spark, sfDir)
    // three files in EVENT-TIME order: arrival order then respects ts, so
    // the stream's first-arrival day equals batch min(event date) per user
    val ranked = events.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("ts"), col("event_id"))))
    val n = ranked.count()
    var lo = 0L
    Seq(n / 3, 2 * n / 3, n).foreach { hi =>
      ranked.filter(col("rn") > lo && col("rn") <= hi).drop("rn")
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(5) // distinct mtimes fix delivery order
      lo = hi
    }
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.newUsersStream(spark, stream), "new_users_feed")
    // exactly-once per user: later batches re-seeing a user emit nothing
    assert(got.groupBy("user_id").count()
      .filter(col("count") > 1).isEmpty, "duplicate first-seen emissions")
    val gotDaily = got.groupBy(col("d")).agg(count(lit(1)).as("new_users"))
    val want = operators.EventOps.q179CumulativeUniques(spark, sfDir)
      .select("d", "new_users")
    assert(gotDaily.exceptAll(want).isEmpty && want.exceptAll(gotDaily).isEmpty)
  }

  test("streaming count-min snapshot equals the batch sketch cells") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    val tmp = java.nio.file.Files.createTempDirectory("scms").toString
    val src = s"$tmp/src"
    val docs = Tables.documents(spark, sfDir)
    // several files so cells must accumulate across micro-batches
    (0 until 3).foreach { i =>
      docs.filter(pmod(col("doc_id"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(src)
    }
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.countMinStream(spark, src, filesPerTrigger = 1),
      "cms_cells", outputMode = "complete")
    val want = operators.MiscOps.cmsCells(
      docs.select(explode(TextFns.tokens(col("text"))).as("term"))
        .filter(col("term") =!= ""))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
