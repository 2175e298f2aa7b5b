package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming re-expression of the reference's contemplated
  * live pipeline (reference rosbag2parquet.cpp:37 "rosnode that ...
  * listens on any topic and serializes data as it comes in" — pure
  * batch in the reference, README.md:133). Event-time = bag receipt
  * time / events.ts; all operators are engine-side extensions with no
  * reference semantics to preserve (SURVEY.md §2.2 streaming row).
  *
  * Every op takes and returns a streaming DataFrame so it composes with
  * any source (file stream over a bag-ETL output directory, Kafka, or
  * MemoryStream in tests) and any sink.
  */
object StreamingOps {

  /** Tumbling-window aggregation with a watermark for late sensor data:
    * the streaming form of the rosbag-info query (reference
    * rosbag_example.cpp:37-49). State is bounded by the watermark.
    */
  def windowedTypeStats(events: DataFrame, windowLen: String = "10 seconds",
                        watermark: String = "30 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Session windows per user (gap-based) — burst detection over a
    * sensor/event stream.
    */
  def sessionCounts(events: DataFrame, gap: String = "5 minutes",
                    watermark: String = "30 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("user_id"), col("n_events"))

  /** Streaming exact dedup bounded by the watermark — the streaming
    * member of the dedup family (Q24's batch hash-groupBy).
    */
  def dedupWithinWatermark(df: DataFrame, keyCols: Seq[String],
                           tsCol: String, watermark: String = "1 minute"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class Reading(userId: Long, ts: java.sql.Timestamp, value: Double)
  final case class GapState(lastTsMicros: Long, count: Long)
  final case class GapAlert(userId: Long, gapMicros: Long, count: Long)

  /** Custom keyed state via flatMapGroupsWithState: per-key inter-event
    * gap detection (the streaming form of Q11's lag-gap analysis) —
    * emits an alert whenever the gap from the previous event exceeds
    * `maxGapMicros`. Demonstrates the KeyValueGroupedDataset state API
    * (SURVEY.md §2.2: "stateful dedup / custom state").
    */
  def gapAlerts(readings: Dataset[Reading], maxGapMicros: Long): Dataset[GapAlert] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.userId)
      .flatMapGroupsWithState[GapState, GapAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Reading], state: GroupState[GapState]) =>
          val sorted = rows.toSeq.sortBy(r => r.ts.getTime)
          var st = state.getOption.getOrElse(GapState(Long.MinValue, 0L))
          val alerts = scala.collection.mutable.ArrayBuffer[GapAlert]()
          sorted.foreach { r =>
            val tsMicros = r.ts.getTime * 1000L
            if (st.lastTsMicros != Long.MinValue && tsMicros - st.lastTsMicros > maxGapMicros)
              alerts += GapAlert(userId, tsMicros - st.lastTsMicros, st.count + 1)
            st = GapState(tsMicros, st.count + 1)
          }
          state.update(st)
          alerts.iterator
      }
  }

  final case class BandDoc(band: Int, bucket: Long, docId: Long, sig: Seq[Long])
  final case class DupCandidate(docId: Long, priorId: Long, estJaccard: Double)

  /** Streaming MinHash near-dup: every arriving document is checked
    * against the HISTORY of its LSH band buckets — "have we already
    * ingested something like this?", the incremental form of Q28's
    * batch dedup. The `scheme` parameter is the SAME MinHashScheme
    * family the batch side derives from LshTuning.minhashScheme —
    * a deployment must pin ONE scheme across its batch backfill and
    * its stream (candidates only exist under a shared banding), so
    * the scheme is explicit here rather than corpus-derived: a stream
    * has no fixed corpus size to derive from, and silently re-deriving
    * per restart would orphan the accumulated bucket state. Default =
    * the small-corpus scheme (16 hashes, 8 bands × 2), which is what
    * the batch side picks below 100k docs.
    *
    * Scale shape: the signature derivation is map-only (no shuffle);
    * the only shuffle keys by (band, bucket); per-bucket state is a
    * BOUNDED ring of the `maxPerBucket` most recent (id, signature)
    * pairs — a viral cluster cannot grow a bucket's state without
    * limit (recall against evicted history degrades, which is the
    * right failure mode for dedup). `estJaccard` is the signature
    * agreement fraction (MinHashUnion.estimate); confirm exactly
    * downstream if needed. Emitted once per shared band, so consumers
    * should de-duplicate pairs (kept out of this operator: streaming
    * dropDuplicates without a watermark holds unbounded state).
    * Production note: wire GroupStateTimeout + a watermark to expire
    * idle buckets entirely.
    */
  /** Shared signature + band derivation for the streaming near-dup
    * family (single definition with batch q28's banding via MinHashLsh;
    * the scheme pins its shape). Works on batch AND streaming frames —
    * the migration state builder below reuses it on the batch history.
    */
  private def bandDocs(docs: DataFrame, idCol: String, textCol: String,
                       scheme: graft.operators.LshTuning.MinHashScheme): Dataset[BandDoc] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.types._
    // fail fast: a silent cast("long") would null out string/UUID ids
    // and kill the query mid-stream on the non-nullable docId field
    val idType = docs.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"idCol '$idCol' must be an integral type, got $idType " +
        "(hash non-numeric ids to long upstream)")
    // the SHARED banded-signature derivation (IncrementalDedup): the
    // streaming state keys, the batch pair generator, and the
    // persisted index bridge all agree on a bucket by construction
    graft.operators.IncrementalDedup.bandedSignatures(
        docs.select(col(idCol).cast("long").as("docId"),
          graft.queries.LlmQueries.shingles(
            graft.queries.Tables.tokens(col(textCol)), 3).as("sh")),
        "docId", "sh", scheme)
      .select(col("band"), col("bucket"), col("doc_id").as("docId"), col("sig"))
      .as[BandDoc]
  }

  def nearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
                        maxPerBucket: Int = 64,
                        scheme: graft.operators.LshTuning.MinHashScheme =
                          graft.operators.LshTuning.MinHashScheme(16, 8, 2),
                        initialState: Option[Dataset[((Int, Long), Seq[(Long, Seq[Long])])]] =
                          None): Dataset[DupCandidate] = {
    import docs.sparkSession.implicits._
    val grouped = bandDocs(docs, idCol, textCol, scheme)
      .groupByKey(d => (d.band, d.bucket))
    val step = (_: (Int, Long), rows: Iterator[BandDoc],
                state: GroupState[Seq[(Long, Seq[Long])]]) => {
      var hist = state.getOption.getOrElse(Seq.empty)
      val out = scala.collection.mutable.ArrayBuffer[DupCandidate]()
      rows.toSeq.sortBy(_.docId).foreach { d =>
        hist.foreach { case (pid, psig) =>
          if (pid != d.docId)
            out += DupCandidate(d.docId, pid,
              graft.queries.MinHashUnion.estimate(d.sig, psig))
        }
        hist = ((d.docId, d.sig) +: hist).take(maxPerBucket)
      }
      state.update(hist)
      out.iterator
    }
    initialState match {
      case Some(init) =>
        grouped.flatMapGroupsWithState[Seq[(Long, Seq[Long])], DupCandidate](
          OutputMode.Append(), GroupStateTimeout.NoTimeout(),
          init.groupByKey(_._1).mapValues(_._2))(step)
      case None =>
        grouped.flatMapGroupsWithState[Seq[(Long, Seq[Long])], DupCandidate](
          OutputMode.Append(), GroupStateTimeout.NoTimeout())(step)
    }
  }

  /** SCHEME MIGRATION for the streaming near-dup: build the banded
    * bucket state a `nearDupCandidates` stream would hold under
    * `scheme` from the batch HISTORY of everything already ingested,
    * to be passed as `initialState` when the stream is restarted under
    * the new scheme (with a FRESH checkpoint — Spark pins the state
    * schema per checkpoint).
    *
    * Why rebuild from history rather than re-key the drained bucket
    * state: a wider scheme (more hashes — what a corpus outgrowing its
    * pinned scheme needs) requires hash values the old signatures never
    * computed; MinHash signatures are not extendable after the fact.
    * Re-deriving from the ingested (id, text) archive — which any
    * production ingest lands anyway (writePartitioned) — is the only
    * transformation that is exact for every scheme change, and it is a
    * one-shot batch job with the same map-only + single-shuffle shape
    * as the stream itself. (A bands×rows re-split at EQUAL numHashes
    * could re-key drained signatures directly, but it is strictly a
    * special case of this builder.)
    *
    * Ring semantics match the stream exactly: per (band, bucket), the
    * `maxPerBucket` most RECENT docs (arrival order = id order, the
    * stream's within-batch processing order), most recent first — so a
    * resumed stream sees the same state a from-scratch run under the
    * new scheme would have accumulated. Bucket collection is bounded by
    * a top-K heap, not a full sort, so a viral cluster costs O(bucket ×
    * log K) and state size stays `maxPerBucket` everywhere.
    */
  def migrateNearDupState(history: DataFrame, idCol: String, textCol: String,
                          scheme: graft.operators.LshTuning.MinHashScheme,
                          maxPerBucket: Int = 64)
      : Dataset[((Int, Long), Seq[(Long, Seq[Long])])] =
    groupRings(bandDocs(history, idCol, textCol, scheme), maxPerBucket)

  /** Per-(band, bucket) bounded rings from banded docs — the state
    * layout `nearDupCandidates` holds. Bucket collection is bounded by
    * a top-K heap, not a full sort, so a viral cluster costs O(bucket ×
    * log K) and state size stays `maxPerBucket` everywhere.
    */
  private def groupRings(bd: Dataset[BandDoc], maxPerBucket: Int)
      : Dataset[((Int, Long), Seq[(Long, Seq[Long])])] = {
    import bd.sparkSession.implicits._
    bd.groupByKey(d => (d.band, d.bucket))
      .mapGroups { (k, it) =>
        // bounded top-K by docId (recency): min-heap of size maxPerBucket
        val heap = new scala.collection.mutable.PriorityQueue[(Long, Seq[Long])]()(
          Ordering.by[(Long, Seq[Long]), Long](_._1).reverse) // min at head
        it.foreach { d =>
          if (heap.size < maxPerBucket) heap.enqueue((d.docId, d.sig))
          else if (d.docId > heap.head._1) { heap.dequeue(); heap.enqueue((d.docId, d.sig)) }
        }
        (k, heap.dequeueAll.reverse.toSeq) // most recent first, like the ring
      }
  }

  /** DRAIN a stopped `nearDupCandidates` stream's accumulated state:
    * the distinct (docId, signature) pairs still remembered by the
    * bucket rings, read from the checkpoint via Spark's state data
    * source (no re-tokenization, no history scan). This is the input
    * to `rebandNearDupState` when only the banding changes.
    *
    * Post-eviction semantics, stated plainly: rings keep the
    * `maxPerBucket` most recent docs per bucket, so a drain recovers
    * what the old stream still REMEMBERED, not the full ingest history
    * — re-banding drained state preserves the dedup stream's effective
    * memory exactly; use `migrateNearDupState` over the ingest archive
    * when the migration should also RESTORE full recall (or widen the
    * signature, which drained sigs cannot do).
    *
    * Sets `coordinatorReportSnapshotUploadLag=false` on the session
    * (left set): the state READER runs in a batch session with no
    * StateStoreCoordinator endpoint, and the provider's snapshot-lag
    * metrics report — pure telemetry — is the only thing that touches
    * the coordinator on this path.
    */
  def drainNearDupState(spark: SparkSession, checkpoint: String): Dataset[(Long, Seq[Long])] = {
    import spark.implicits._
    spark.conf.set(
      "spark.sql.streaming.stateStore.coordinatorReportSnapshotUploadLag", "false")
    spark.read.format("statestore").option("path", checkpoint).load()
      .select(explode(col("value.groupState.value")).as("e"))
      .select(col("e._1").as("docId"), col("e._2").as("sig"))
      .dropDuplicates("docId") // one signature per doc; docs appear once per shared band
      .as[(Long, Seq[Long])]
  }

  /** Re-key DRAINED signatures under a scheme with the SAME number of
    * hashes but a different bands×rows split (e.g. 8×2 → 4×4 to raise
    * precision as a corpus grows) — the migration special case where
    * the old signatures are directly reusable and no text access is
    * needed. For a WIDER scheme use `migrateNearDupState`: minhash
    * signatures cannot be extended after the fact.
    */
  def rebandNearDupState(sigs: Dataset[(Long, Seq[Long])],
                         scheme: graft.operators.LshTuning.MinHashScheme,
                         maxPerBucket: Int = 64)
      : Dataset[((Int, Long), Seq[(Long, Seq[Long])])] = {
    import sigs.sparkSession.implicits._
    val w = scheme.bands * scheme.rows
    val bd = sigs.toDF("docId", "sig")
      // fail fast on a too-narrow drained signature: element_at past
      // the array end is null (non-ANSI), so xxhash64 would silently
      // hash only the in-range slots and fully-out-of-range bands
      // would collapse every doc into ONE bucket — garbage candidate
      // floods with no error. The doc says "same number of hashes";
      // this enforces it.
      // assert_true returns NULL (or throws), so isnull(...) is the
      // always-true pass-through that forces the check to evaluate
      .filter(isnull(assert_true(size(col("sig")) >= lit(w),
        lit(s"drained signature narrower than scheme ${scheme.bands}x${scheme.rows}" +
          s" (needs >= $w slots) — re-derive via migrateNearDupState instead"))))
      .select(col("docId"), col("sig"),
        explode(graft.queries.MinHashLsh
          .bandBuckets(col("sig"), scheme.bands, scheme.rows)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("docId"), col("sig"))
      .as[BandDoc]
    groupRings(bd, maxPerBucket)
  }

  /** Streaming contamination screen: score each arriving document's
    * shingle overlap against a BATCH-built Bloom filter of the
    * benchmark set (BloomScreen.build over the eval suite, rebuilt
    * when the suite changes — the classic static-side sketch).
    * Entirely MAP-ONLY and stateless: the filter rides along as a
    * binary literal, the probe runs inside a higher-order filter over
    * the shingle array, so this adds zero shuffles and zero state to
    * any ingest stream and works under any watermark. No false
    * negatives (Bloom), so `bloomOverlap >= threshold` is a SUPERSET
    * of the exact contamination flags — route flagged docs to the
    * exact batch check (q47), the same screen-then-confirm contract as
    * q59.
    */
  def contaminationScreen(docs: DataFrame, idCol: String, textCol: String,
                          benchBloom: Array[Byte], minOverlap: Double = 0.10): DataFrame = {
    import org.apache.spark.sql.graftfns.BloomScreen
    docs
      .select(col(idCol), graft.queries.LlmQueries.shingles(
        graft.queries.Tables.tokens(col(textCol)), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col(idCol), size(col("sh")).as("n_shingles"),
        size(filter(col("sh"), s => BloomScreen.mightContain(benchBloom, s)))
          .as("bloom_overlap"))
      .filter(col("bloom_overlap").cast("double") / col("n_shingles") >= minOverlap)
  }

  /** Stream-stream interval join: enrich each left-stream row with the
    * right-stream rows for the same key whose event time falls inside
    * [left.ts - lower, left.ts + upper] — the streaming form of the
    * as-of/range-join family (batch q22/q23/q58). Both sides carry
    * watermarks, and the time-bound condition is what lets Spark PURGE
    * state: a right row is dropped once the left watermark passes
    * right.ts + lower, so state is bounded by (watermark + interval),
    * never by stream length. Inner join only here — outer interval
    * joins emit nulls on watermark expiry and belong to the caller's
    * latency budget, not a library default.
    *
    * Column names must be distinct across the two sides except for
    * `key` (standard streaming-join hygiene; the require makes the
    * ambiguity an error instead of a silent resolution).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   leftWatermark: String = "30 seconds",
                   rightWatermark: String = "30 seconds",
                   lower: String = "10 seconds",
                   upper: String = "0 seconds"): DataFrame = {
    val overlap = (left.columns.toSet intersect right.columns.toSet) - key
    require(overlap.isEmpty,
      s"both sides define ${overlap.mkString(", ")}; rename before joining")
    require(leftTs != rightTs, "the two event-time columns must be named differently")
    val l = left.withWatermark(leftTs, leftWatermark).alias("l")
    val r = right.withWatermark(rightTs, rightWatermark).alias("r")
    l.join(r, expr(
      s"""l.$key = r.$key AND
         |$rightTs >= $leftTs - INTERVAL $lower AND
         |$rightTs <= $leftTs + INTERVAL $upper""".stripMargin))
      .drop(r.col(key))
  }

  /** File-stream source over a bag-ETL output directory: the "live
    * rosnode" analog — as new per-type parquet files land, they flow
    * through the same relational ops. Caller supplies the schema
    * (streams cannot infer).
    */
  def streamEtlOutput(spark: SparkSession, dir: String,
                      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Standard sink: partitioned parquet with checkpointing — mirrors the
    * batch ETL layout (datatype partitioning, reference README.md:4).
    */
  def writePartitioned(df: DataFrame, outDir: String, checkpoint: String,
                       partitionCol: String = "event_type") =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .partitionBy(partitionCol)
      .outputMode(OutputMode.Append())

  /** Stream→batch bridge for the incremental dedup index: each
    * micro-batch's banded bucket rows — the SAME MinHashLsh derivation
    * the streaming near-dup keys its state on, so the two can never
    * disagree on a bucket — append to the persisted
    * [[graft.operators.IncrementalDedup]] table (created on first
    * batch). Stream-ingested documents thereby become probe-able by
    * later BATCH dedup runs with no rebuild: the lambda-architecture
    * seam, closed with one derivation.
    *
    * Delivery note: foreachBatch replays a batch after a crash, so
    * duplicate bucket rows can land (at-least-once). The index is
    * semantically a SET — `candidates` ends in DISTINCT — so replays
    * change cost, never results; [[graft.operators.IncrementalDedup
    * .compactIndex]] at maintenance cadence folds them away.
    */
  def indexSink(docs: DataFrame, idCol: String, textCol: String,
      scheme: graft.operators.LshTuning.MinHashScheme, table: String,
      buckets: Int, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = bandDocs(batch, idCol, textCol, scheme)
          .select(col("band"), col("bucket"), col("docId").as("doc_id"))
        val s = batch.sparkSession
        if (s.catalog.tableExists(table))
          graft.operators.IncrementalDedup.grow(rows, table, scheme)
        else
          graft.operators.IncrementalDedup.saveIndex(rows, table, buckets, scheme)
      }
      .start()
}
