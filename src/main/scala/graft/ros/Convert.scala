package graft.ros

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fleet-scale `ros2 bag convert` / `rosbag filter`: normalize a
  * MIXED container directory (or any frame carrying the mixed spine's
  * `topic`/`type`/`timestamp`/`data` columns) into ONE target format,
  * optionally transformed relationally in between.
  *
  * ```scala
  * // archive a mixed upload prefix as one queryable mcap fleet
  * Convert.run(spark, "/uploads/robot7", "/archive/robot7", "mcap",
  *   transform = _.filter(col("topic") =!= "/camera/raw"))
  * ```
  *
  * The read side is [[MixedRead.spine]] (catalog pruning, filter
  * pushdown and metadata aggregation intact per format); the write
  * side is the target's DSv2 sink, so the plan is scan → optional
  * transform → repartition → embarrassingly-parallel encode, no
  * shuffle beyond the one the caller asks for with `partitions`.
  * Message payloads pass through byte-exact; the TIMESTAMP convention
  * is normalized to nanoseconds by the spine and re-encoded per
  * target ((sec, nsec) receipt pairs for rosbag1). Schema/connection
  * DEFINITIONS do not cross container dialects automatically — pass
  * the target sink's `schema_defs_from`/`conn_defs_from` in `options`
  * when typed re-reads of the output are needed.
  */
object Convert {
  /** Conform a mixed-spine frame to `format`'s write spine. The
    * spine's `encoding` column (each source dialect's wire
    * serialization — "cdr", "protobuf", "ros1") labels the target's
    * channels so typed consumers dispatch correctly; rosbag1 has no
    * per-connection encoding field (everything is ros1 serialization
    * there — converting CDR payloads INTO a .bag produces a container
    * only spine-level consumers can decode, which `run` leaves to the
    * caller's judgment).
    */
  def prepare(df: DataFrame, format: String): DataFrame = {
    def c(n: String): Column = col(n)
    val enc: Column =
      if (df.columns.contains("encoding")) c("encoding") else lit("cdr")
    format match {
      case "mcap" => mcap.McapExport.prepare(df,
        topic = c("topic"), logTimeNs = c("timestamp"), data = c("data"),
        schemaName = c("type"), messageEncoding = enc)
      case "rosbag" => bag.BagExport.prepare(df,
        topic = c("topic"), timeNs = c("timestamp"), data = c("data"),
        datatype = c("type"))
      case "db3" => db3.Db3Export.prepare(df,
        topic = c("topic"), timestampNs = c("timestamp"), data = c("data"),
        tpe = c("type"), serializationFormat = enc)
      case other => throw new IllegalArgumentException(
        s"unknown target container format '$other' (mcap | rosbag | db3)")
    }
  }

  /** Read `inPath` as a mixed spine, apply `transform`, write
    * `format` containers to `outPath`. `partitions` > 0 controls the
    * output file count (one container file per partition — size for
    * the target filesystem, not for the input's layout).
    */
  def run(spark: SparkSession, inPath: String, outPath: String,
      format: String, partitions: Int = 0,
      transform: DataFrame => DataFrame = identity,
      options: Map[String, String] = Map.empty,
      mode: String = "append"): Unit = {
    val spine = transform(MixedRead.spine(spark, inPath))
    val prepared = prepare(spine, format)
    val sized = if (partitions > 0) prepared.repartition(partitions) else prepared
    options.foldLeft(sized.write.format(format).mode(mode)) {
      case (w, (k, v)) => w.option(k, v)
    }.save(outPath)
  }

  /** The CONTINUOUS convert: a fleet-upload prefix receiving `.bag` +
    * `.mcap` + `.db3` at any time ([[MixedRead.stream]]) normalizes
    * into an ever-growing `format` archive through the streaming sink
    * — exactly-once per the sinks' deterministic (query, epoch,
    * partition) naming, resumable from `checkpoint`. Returns the
    * started query; pass `Trigger.AvailableNow()` for a drain-and-stop
    * catch-up run, or a processing-time trigger for a standing
    * normalizer.
    */
  def runStream(spark: SparkSession, inPath: String, outPath: String,
      format: String, checkpoint: String,
      transform: DataFrame => DataFrame = identity,
      options: Map[String, String] = Map.empty,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val prepared = prepare(transform(MixedRead.stream(spark, inPath)), format)
    options.foldLeft(
      prepared.writeStream.format(format)
        .option("checkpointLocation", checkpoint)
        .outputMode("append").trigger(trigger)) {
      case (w, (k, v)) => w.option(k, v)
    }.start(outPath)
  }
}
