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
  /** events.ts has shipped in two parquet layouts: TIMESTAMP(NANOS, ntz)
    * — which Spark cannot read natively ([PARQUET_TYPE_ILLEGAL]), so we
    * read it as epoch-nanos Long via the legacy conf — and plain
    * TIMESTAMP(MICROS, ntz). Dispatch on the inferred footer type so
    * both layouts yield the same surface: a micros-precision NTZ `ts`
    * (floor division from nanos — matches DuckDB's TIMESTAMP_NS →
    * TIMESTAMP cast, which the oracle SQL applies on its side; a no-op
    * from micros) plus an epoch-nanos `ts_ns` Long.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = eventsRawSchema(s, d)
    val df = s.read.schema(raw).parquet(s"$d/events.parquet")
    raw("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanos layout. FLOOR division to micros (pmod keeps it exact in
        // the long domain): `div` truncates toward zero, which would
        // disagree with DuckDB's flooring TIMESTAMP_NS cast pre-epoch.
        df.withColumn("ts_ns", col("ts").cast("long"))
          .withColumn("ts", ntz(timestamp_micros(
            expr("(ts_ns - pmod(ts_ns, 1000L)) div 1000"))))
      case TimestampNTZType | TimestampType =>
        // micros layout: ts is directly usable; derive nanos for the
        // ts_ns consumers (UTC session ⇒ unix_micros is wall-clock).
        // Range bound: ts_ns = micros * 1000 overflows Long past
        // ~2262-04-11 (2^63 ns after epoch) — an ANSI error in Spark 4,
        // not silent wrap. The nanos layout bounds the range inherently;
        // the driver testdata stays within a few years of 2024.
        df.withColumn("ts", ntz(col("ts")))
          .withColumn("ts_ns", us(col("ts")) * lit(1000L))
      case other =>
        // a third layout (INT96, string, millis...) must fail loudly,
        // not be silently decoded under the micros assumption
        throw new IllegalArgumentException(
          s"events.ts has unsupported parquet-inferred type $other; " +
            "expected nanos-as-Long or TIMESTAMP(MICROS) NTZ")
    }
  }
  /** The raw events.parquet read schema (ts as nanos-epoch Long for the
    * NANOS layout, TimestampNTZType for the MICROS layout) — inferred
    * under a SCOPED nanosAsLong conf (a no-op on micros footers) and
    * usable by any reader (batch or file-stream) without session state.
    * Public because the streaming path needs the same schema for
    * readStream.schema(...).
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
