package graft.ros

import scala.collection.immutable.TreeMap

/** Driver-side per-epoch observability for the streaming container
  * sinks — what a STANDING fleet normalizer ([[Convert.runStream]])
  * watches. Spark's own `StreamingQueryProgress` reports input rows
  * and wall clock, but not what the sink actually LANDED; each
  * container sink's epoch commit records (rows, files, bytes) here
  * from its tasks' commit messages, so the numbers are exactly the
  * committed output — an epoch replay overwrites its entry rather
  * than double-counting, mirroring the sinks' exactly-once naming.
  *
  * Keyed by the write's queryId (the streaming query id the sinks
  * already use for their deterministic file names), truncated to the
  * same 8 chars. Bounded: the last [[maxEpochs]] epochs per query and
  * O(#queries) keys — a month-long normalizer cannot grow the driver
  * heap. [[SinkMetricsListener]] bridges these numbers onto Spark's
  * listener bus events for dashboards that already consume
  * `QueryProgressEvent`.
  */
object SinkEpochMetrics {
  final case class EpochStats(rows: Long, files: Long, bytes: Long)

  private val maxEpochs = 256
  private val store = new java.util.concurrent.ConcurrentHashMap[
    String, TreeMap[Long, EpochStats]]()

  private[ros] def record(queryId: String, epoch: Long, rows: Long,
      files: Long, bytes: Long): Unit = {
    store.compute(queryId.take(8), (_, cur) => {
      val base = if (cur == null) TreeMap.empty[Long, EpochStats] else cur
      val m = base + (epoch -> EpochStats(rows, files, bytes))
      if (m.size > maxEpochs) m.drop(m.size - maxEpochs) else m
    })
    ()
  }

  /** Epoch → stats for a streaming query (full or 8-char id). */
  def forQuery(queryId: String): Map[Long, EpochStats] =
    Option(store.get(queryId.take(8)))
      .getOrElse(TreeMap.empty[Long, EpochStats])

  def clear(queryId: String): Unit = { store.remove(queryId.take(8)); () }
}

/** A `StreamingQueryListener` joining Spark's per-batch progress
  * (wall clock, input rows) with the sink's own landed numbers — the
  * observable surface for a standing normalizer:
  *
  * ```scala
  * val l = new SinkMetricsListener
  * spark.streams.addListener(l)
  * Convert.runStream(spark, in, out, "mcap", ck, trigger = ...)
  * // later: l.reports.foreach(r => log(s"epoch ${r.batchId}: " +
  * //   s"${r.sink.map(_.files)} files, ${r.sink.map(_.bytes)} bytes"))
  * ```
  *
  * `sink` is None for batches whose sink recorded nothing (empty
  * epochs leave no files and no entry). Bounded like the registry.
  */
final class SinkMetricsListener
    extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._

  final case class EpochReport(queryId: String, batchId: Long,
      durationMs: Long, inputRows: Long,
      sink: Option[SinkEpochMetrics.EpochStats])

  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[EpochReport]()

  def reports: Seq[EpochReport] = {
    val it = buf.iterator()
    val out = scala.collection.mutable.ArrayBuffer[EpochReport]()
    while (it.hasNext) out += it.next()
    out.toSeq
  }

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    // the sinks key on LogicalWriteInfo.queryId = the query ID (not
    // the per-restart runId); look up both defensively
    val stats = SinkEpochMetrics.forQuery(p.id.toString)
      .get(p.batchId)
      .orElse(SinkEpochMetrics.forQuery(p.runId.toString).get(p.batchId))
    // triggerExecution already CONTAINS the sub-phase durations
    // (addBatch, getBatch, walCommit, ...) — summing every entry
    // would roughly double-count wall clock; the sum is only the
    // fallback when a source omits the total
    buf.add(EpochReport(p.id.toString, p.batchId,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue)
        .getOrElse(p.durationMs.values.stream.mapToLong(_.longValue).sum),
      p.numInputRows, stats))
    while (buf.size > 256) { buf.poll(); () }
  }
}
