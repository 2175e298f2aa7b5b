package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loaders + shared column helpers for the driver testdata tables
  * (TESTDATA.md). All timestamps are normalised to TimestampNTZType so
  * that written parquet matches the DuckDB oracle's naive TIMESTAMP
  * (isAdjustedToUTC=false) bit-for-bit; session timezone is UTC so the
  * cast is wall-clock-preserving.
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS, ntz), which Spark cannot read
    * natively ([PARQUET_TYPE_ILLEGAL]). We read it as epoch-nanos Long via
    * the legacy conf, then derive a micros-precision NTZ `ts` (floor
    * division — matches DuckDB's TIMESTAMP_NS → TIMESTAMP cast, which the
    * oracle SQL applies on its side). The raw nanos stay as `ts_ns`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // The legacy conf is needed only for SCHEMA INFERENCE (the footer
    // read maps TIMESTAMP(NANOS) → LongType); with an EXPLICIT schema
    // the scan itself reads nanos-as-long without any conf. So scope
    // the mutation to the eager footer read and restore — the returned
    // (lazy) DataFrame carries the explicit schema and leaks no session
    // state into co-hosted workloads. (Spark 4.1 exposes no per-read
    // option for this; ParquetOptions has no nanosAsLong key.)
    // FLOOR division to micros (pmod keeps it exact in the long domain):
    // `div` truncates toward zero, which would disagree with DuckDB's
    // flooring TIMESTAMP_NS cast for pre-epoch nanos.
    s.read.schema(eventsRawSchema(s, d)).parquet(s"$d/events.parquet")
      .withColumn("ts_ns", col("ts").cast("long"))
      .withColumn("ts", ntz(timestamp_micros(
        expr("(ts_ns - pmod(ts_ns, 1000L)) div 1000"))))
  }
  /** The raw events.parquet read schema (ts as nanos-epoch Long) —
    * inferred under a SCOPED nanosAsLong conf and usable by any reader
    * (batch or file-stream) without session state. Public because the
    * streaming path needs the same schema for readStream.schema(...).
    */
  def eventsRawSchema(s: SparkSession, d: String): org.apache.spark.sql.types.StructType =
    // synchronized: the set/infer/restore window is not safe under
    // concurrent SAME-SESSION callers — thread B could hit the footer
    // read with the flag restored out from under it, or capture A's
    // raised value as its "prior" and re-leak it. Session confs are
    // per-session state, so cross-session callers never contend here;
    // the JVM-wide lock is coarser than needed but this runs once per
    // (session, dir) in practice (the schema feeds cached frames).
    synchronized {
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prior = s.conf.getOption(key)
      try { s.conf.set(key, "true"); t(s, d, "events").schema }
      finally prior match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }

  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Timestamp column → naive (NTZ) for oracle-parity output. */
  def ntz(c: Column): Column = c.cast(TimestampNTZType)

  /** Epoch microseconds of a timestamp column (NTZ or LTZ; UTC session
    * makes the two identical) — mirrors DuckDB epoch_us().
    */
  def us(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Spread a (typically single-file, hence single-partition) small
    * table across the session's shuffle partitions before per-row-
    * expensive work. Spark's higher-order functions (transform/
    * aggregate/zip_with) are interpreted (CodegenFallback), so leaving
    * a 5k-row table in 1 partition serializes 10s+ of lambda
    * evaluation on one core; one tiny shuffle buys full parallelism.
    */
  def spread(df: DataFrame, by: Column): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions, by)

  /** Deterministic cross-engine rounding of a double: floor(x*10^k+0.5)
    * / 10^k is pure IEEE arithmetic, identical in Spark and DuckDB —
    * unlike ROUND(double, k), whose half-tie behavior is impl-defined.
    */
  def rk(c: Column, k: Int): Column = {
    val p = math.pow(10, k)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** Tokens of lower-cased text split on the \s+ regex, empties
    * dropped. Oracles MUST use regexp_split_to_array(lower(x), '\s+')
    * — a single-space string_split diverges on tabs/newlines.
    */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), x => x =!= lit(""))
}
