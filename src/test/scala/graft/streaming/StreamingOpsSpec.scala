package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase

class StreamingOpsSpec extends SparkTestBase {
  import StreamingOps._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                      event_type: String, value: Double)

  private def runBatches[T](q: org.apache.spark.sql.streaming.DataStreamWriter[T]): Unit = {
    val sq = q.trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination(60000)
  }

  test("windowed type stats with watermark (streaming rosbag-info)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, ts(100), 1, "click", 1.0), Ev(2, ts(105), 1, "click", 2.0),
      Ev(3, ts(112), 2, "view", 3.0), Ev(4, ts(119), 2, "click", 4.0))
    val out = windowedTypeStats(mem.toDF(), "10 seconds", "5 seconds")
    runBatches(out.writeStream.format("memory").queryName("win").outputMode("append"))
    // AvailableNow + append: windows closed by final watermark are emitted
    val rows = spark.table("win").orderBy("win_start", "event_type")
      .select(unix_timestamp(col("win_start")).as("s"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // events at 100,105 (click) -> window [100,110); 112 view + 119 click -> [110,120)
    assert(rows.contains((100L, "click", 2L)))
    // the [110,120) window closes only if watermark passes 120; final
    // watermark = max(ts) - 5s = 114 < 120, so it stays in state: only
    // the first window is emitted. That asymmetry IS the semantics.
    assert(rows.length == 1)
  }

  test("streaming minhash near-dup flags copies against bucket history") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def doc(seed: Int): String =
      (0 until 30).map(i => s"tok${(seed * 31 + i * 7) % 97}w$i").mkString(" ")
    val mem = MemoryStream[(Long, String)]
    val out = nearDupCandidates(mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    // SAME checkpoint across two query runs: run 2 resumes the state
    // store, so its candidate pairs can only come from state persisted
    // by run 1 — a genuine cross-micro-batch state test (one run with
    // two addData calls would collapse into a single batch under
    // AvailableNow and never read restored state).
    // parquet sink: the memory sink rejects checkpoint recovery
    val ck = java.nio.file.Files.createTempDirectory("nd_ck").toString
    val sink = java.nio.file.Files.createTempDirectory("nd_out").toString
    def runOnce(): Unit = {
      val sq = out.writeStream.format("parquet").option("path", sink)
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      sq.awaitTermination(60000)
    }
    // run 1: three distinct docs, no pairs expected
    mem.addData((1L, doc(1)), (2L, doc(2)), (3L, doc(3)))
    runOnce()
    assert(spark.read.parquet(sink).count() == 0)
    // run 2 (resumed from the same checkpoint): 4 = near-copy of 1 (one
    // token changed), 5 = exact copy of 2, 6 = fresh. All pairs emitted
    // now can only come from run 1's RESTORED state.
    mem.addData(
      (4L, doc(1).replace("w7 ", "w7x ")),
      (5L, doc(2)),
      (6L, doc(42)))
    runOnce()
    val cands = spark.read.parquet(sink)
      .groupBy("docId", "priorId").agg(max("estJaccard").as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cands.contains((4L, 1L)), s"near-copy not flagged: $cands")
    assert(cands((4L, 1L)) >= 0.5)
    assert(cands((5L, 2L)) == 1.0, s"exact copy estimate: $cands")
    // fresh docs don't pair with history
    assert(!cands.keys.exists { case (a, b) => a == 6L || b == 6L })
    // history only: a doc never pairs against a LATER doc
    assert(cands.keys.forall { case (a, b) => a > b })
  }

  test("scheme migration: migrated state equals a from-scratch run under the new scheme") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.LshTuning.MinHashScheme
    def doc(seed: Int): String =
      (0 until 30).map(i => s"tok${(seed * 31 + i * 7) % 97}w$i").mkString(" ")
    // batch 1 = the already-ingested corpus (streamed under the OLD
    // 16-hash scheme elsewhere); batch 2 = post-migration arrivals,
    // containing a near-copy of doc 1, an exact copy of doc 3, a fresh
    // doc, and a within-batch exact pair (8, 9).
    val batch1 = Seq((1L, doc(1)), (2L, doc(2)), (3L, doc(3)))
    val batch2 = Seq((5L, doc(1).replace("w7 ", "w7x ")), (6L, doc(3)),
      (7L, doc(42)), (8L, doc(50)), (9L, doc(50)))
    val wide = MinHashScheme(32, 16, 2) // the corpus outgrew 16 hashes
    def collectCands(sink: String): Map[(Long, Long), Double] =
      spark.read.parquet(sink)
        .groupBy("docId", "priorId").agg(max("estJaccard").as("est"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def runOnce(mem: MemoryStream[(Long, String)], init: Option[
        org.apache.spark.sql.Dataset[((Int, Long), Seq[(Long, Seq[Long])])]],
        ck: String, sink: String): Unit = {
      val out = nearDupCandidates(mem.toDF().toDF("doc_id", "text"),
        "doc_id", "text", maxPerBucket = 64, scheme = wide, initialState = init)
      val sq = out.writeStream.format("parquet").option("path", sink)
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      sq.awaitTermination(60000)
    }
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    // FROM-SCRATCH reference: stream batch1 then batch2 under `wide`
    val refMem = MemoryStream[(Long, String)]
    val (refCk, refSink) = (tmp("mig_ref_ck"), tmp("mig_ref_out"))
    refMem.addData(batch1: _*); runOnce(refMem, None, refCk, refSink)
    refMem.addData(batch2: _*); runOnce(refMem, None, refCk, refSink)
    val refCands = collectCands(refSink).filter { case ((a, _), _) => a >= 5L }
    // MIGRATED: build `wide` state from the batch-1 history, resume a
    // NEW stream (fresh checkpoint) with it, feed only batch2
    val init = migrateNearDupState(batch1.toDF("doc_id", "text"), "doc_id", "text", wide)
    val migMem = MemoryStream[(Long, String)]
    val (migCk, migSink) = (tmp("mig_ck"), tmp("mig_out"))
    migMem.addData(batch2: _*); runOnce(migMem, Some(init), migCk, migSink)
    val migCands = collectCands(migSink)
    assert(migCands == refCands,
      s"migrated state diverges from from-scratch: mig=$migCands ref=$refCands")
    // and the migration actually carried history: cross-batch pairs exist
    assert(migCands.contains((6L, 3L)) && migCands((6L, 3L)) == 1.0, s"$migCands")
    assert(migCands.keys.exists { case (a, b) => a == 5L && b == 1L }, s"$migCands")
  }

  test("drain + reband: equal-width banding change reuses drained signatures") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.LshTuning.MinHashScheme
    def doc(seed: Int): String =
      (0 until 30).map(i => s"tok${(seed * 31 + i * 7) % 97}w$i").mkString(" ")
    val batch1 = Seq((1L, doc(1)), (2L, doc(2)), (3L, doc(3)))
    val batch2 = Seq((5L, doc(1).replace("w3 ", "w3x ")), (6L, doc(3)), (7L, doc(9)))
    val a = MinHashScheme(16, 8, 2)
    val b = MinHashScheme(16, 4, 4) // same width, finer banding (higher precision)
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    def runOnce(mem: MemoryStream[(Long, String)], scheme: MinHashScheme, init: Option[
        org.apache.spark.sql.Dataset[((Int, Long), Seq[(Long, Seq[Long])])]],
        ck: String, sink: String): Unit = {
      val out = nearDupCandidates(mem.toDF().toDF("doc_id", "text"),
        "doc_id", "text", maxPerBucket = 64, scheme = scheme, initialState = init)
      val sq = out.writeStream.format("parquet").option("path", sink)
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      sq.awaitTermination(60000)
    }
    def collectCands(sink: String): Map[(Long, Long), Double] =
      spark.read.parquet(sink)
        .groupBy("docId", "priorId").agg(max("estJaccard").as("est"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // OLD stream under scheme A accumulates state in its checkpoint
    val aMem = MemoryStream[(Long, String)]
    val (aCk, aSink) = (tmp("rb_a_ck"), tmp("rb_a_out"))
    aMem.addData(batch1: _*); runOnce(aMem, a, None, aCk, aSink)
    // drain its state: exactly batch1's (docId, sig) pairs, once each
    val drained = drainNearDupState(spark, aCk)
    val byDoc = drained.collect().toMap
    assert(byDoc.keySet == Set(1L, 2L, 3L) && byDoc.values.forall(_.length == 16), s"$byDoc")
    // reband to B and resume a new stream; candidates on batch2 must
    // equal a from-scratch scheme-B run's
    val migMem = MemoryStream[(Long, String)]
    val (migCk, migSink) = (tmp("rb_mig_ck"), tmp("rb_mig_out"))
    migMem.addData(batch2: _*)
    runOnce(migMem, b, Some(rebandNearDupState(drained, b)), migCk, migSink)
    val refMem = MemoryStream[(Long, String)]
    val (refCk, refSink) = (tmp("rb_ref_ck"), tmp("rb_ref_out"))
    refMem.addData(batch1: _*); runOnce(refMem, b, None, refCk, refSink)
    refMem.addData(batch2: _*); runOnce(refMem, b, None, refCk, refSink)
    val refCands = collectCands(refSink).filter { case ((x, _), _) => x >= 5L }
    val migCands = collectCands(migSink)
    assert(migCands == refCands, s"mig=$migCands ref=$refCands")
    assert(migCands.contains((6L, 3L)) && migCands((6L, 3L)) == 1.0, s"$migCands")
  }

  test("streaming dedup within watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, ts(10), 1, "a", 1.0), Ev(1, ts(11), 1, "a", 1.0),   // dup event_id
      Ev(2, ts(12), 1, "b", 2.0))
    val out = dedupWithinWatermark(mem.toDF(), Seq("event_id"), "ts", "1 minute")
    runBatches(out.writeStream.format("memory").queryName("dedup").outputMode("append"))
    val got = spark.table("dedup").select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("flatMapGroupsWithState gap alerts across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Reading]
    mem.addData(Reading(7, ts(100), 1.0), Reading(7, ts(101), 1.0))
    val out = gapAlerts(mem.toDS(), maxGapMicros = 5L * 1000000)
    val sq = out.writeStream.format("memory").queryName("gaps").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    sq.awaitTermination(60000)
    assert(spark.table("gaps").count() == 0)  // 1s gap, no alert

    // second batch: 50s gap -> alert, state carried across batches
    mem.addData(Reading(7, ts(151), 2.0))
    val sq2 = out.writeStream.format("memory").queryName("gaps2").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gap_ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    sq2.awaitTermination(60000)
    // fresh query (fresh state) sees all 3 readings: gap 101->151 = 50s
    val alerts = spark.table("gaps2").as[GapAlert].collect()
    assert(alerts.length == 1)
    assert(alerts.head.userId == 7 && alerts.head.gapMicros == 50L * 1000000)
  }

  test("session windows per user") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, ts(100), 1, "a", 1.0), Ev(2, ts(160), 1, "a", 1.0),  // same session (gap 60s < 5m)
      Ev(3, ts(1000), 1, "a", 1.0),                               // new session
      Ev(4, ts(5000), 9, "a", 1.0))                               // watermark pusher
    val out = sessionCounts(mem.toDF(), "5 minutes", "1 second")
    runBatches(out.writeStream.format("memory").queryName("sess").outputMode("append"))
    val rows = spark.table("sess").filter(col("user_id") === 1)
      .orderBy("sess_start")
      .select(unix_timestamp(col("sess_start")), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((100L, 2L), (1000L, 1L)))
  }

  test("streaming session_window ≡ batch q55 sessionization on testdata (12h gap)") {
    // the streaming and batch session operators must agree on what a
    // session IS. Boundary note: session_window starts a new session at
    // gap >= 12h, q55's lag-flag at gap > 12h — identical unless a gap
    // lands on exactly 43200.000000s, which the testdata's microsecond
    // timestamps never do (verified against the corpus).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val evs = graft.queries.Tables.events(spark, sf)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .collect().toSeq
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val mem = MemoryStream[Ev]
    mem.addData(evs: _*)
    // far-future watermark pusher closes every real session
    mem.addData(Ev(-1L, new Timestamp(evs.map(_.ts.getTime).max + 400L * 24 * 3600 * 1000),
      -1L, "pusher", 0.0))
    val out = sessionCounts(mem.toDF(), "12 hours", "1 second")
    runBatches(out.writeStream.format("memory").queryName("sess12h").outputMode("append"))
    val streaming = spark.table("sess12h").filter(col("user_id") >= 0)
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val batch = graft.SparkEntry.queries("q55_sessionize")(spark, sf)
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(streaming.nonEmpty && streaming == batch,
      s"streaming sessions (${streaming.size}) != batch sessions (${batch.size})")
  }

  test("streaming contamination screen is a superset of the exact batch flags") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // batch side: build the benchmark bloom exactly as q59 does
    val sets = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.queries.LlmQueries.shingles(
        graft.queries.Tables.tokens(col("text")), 3).as("sh"))
    val isBench = pmod(col("doc_id"), lit(97)) === 0
    val benchSh = sets.filter(isBench).select(explode(col("sh")).as("s")).distinct()
    val bloom = org.apache.spark.sql.graftfns.BloomScreen
      .build(benchSh, col("s"), math.max(benchSh.count(), 1L), fpp = 0.01)
    // stream the non-bench corpus through the screen
    val docs = graft.queries.Tables.documents(spark, sf)
      .filter(!isBench).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs: _*)
    val out = contaminationScreen(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", bloom, minOverlap = 0.10)
    runBatches(out.writeStream.format("memory").queryName("contam").outputMode("append"))
    val flagged = spark.table("contam").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val exact = graft.SparkEntry.queries("q47_contamination")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty && exact.subsetOf(flagged),
      s"bloom screen missed exact flags: ${exact -- flagged}")
    // and the screen is selective, not a pass-through
    assert(flagged.size < docs.size / 2,
      s"screen passed ${flagged.size}/${docs.size} docs - not screening")
  }

  test("stream-stream interval join equals the batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // orders enriched with the user's events from the preceding 10s
    val orders = Seq((1L, ts(100), "o1"), (1L, ts(130), "o2"),
      (2L, ts(105), "o3"), (3L, ts(110), "o4"))
    val events = Seq((1L, ts(95), "click"), (1L, ts(99), "view"),
      (1L, ts(125), "click"), (2L, ts(104), "view"),
      (2L, ts(90), "stale"), (3L, ts(111), "late"))
    val lMem = MemoryStream[(Long, Timestamp, String)]
    val rMem = MemoryStream[(Long, Timestamp, String)]
    lMem.addData(orders: _*)
    rMem.addData(events: _*)
    val joined = intervalJoin(
      lMem.toDF().toDF("user_id", "ots", "order_id"),
      rMem.toDF().toDF("user_id", "ets", "etype"),
      key = "user_id", leftTs = "ots", rightTs = "ets",
      lower = "10 seconds", upper = "0 seconds")
    runBatches(joined.writeStream.format("memory").queryName("ivj").outputMode("append"))
    val got = spark.table("ivj")
      .select("order_id", "etype").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val batch = orders.toDF("user_id", "ots", "order_id")
      .join(events.toDF("user_id", "ets", "etype"), Seq("user_id"))
      .filter(col("ets") >= col("ots") - expr("INTERVAL 10 seconds") &&
        col("ets") <= col("ots"))
      .select("order_id", "etype").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == batch, s"stream=$got batch=$batch")
    // the time bound actually prunes: the stale and late events match nothing
    assert(!got.exists(_._2 == "stale") && !got.exists(_._2 == "late"))
  }

  test("rebandNearDupState fails fast on signatures narrower than the target scheme") {
    import spark.implicits._
    val sigs = Seq((1L, Seq(11L, 22L, 33L, 44L))).toDS()
    val wide = graft.operators.LshTuning.MinHashScheme(16, 8, 2)
    val e = intercept[Throwable] {
      rebandNearDupState(sigs, wide).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("narrower"))),
      s"expected the narrow-signature assert, got: $e")
  }
}
