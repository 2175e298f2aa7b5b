package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layouts — the co-location primitive for the engine's
  * own dominant join pattern (per-type tables ⋈ Messages on seqno,
  * reference README.md:119-121) and for any repeated large–large
  * equi-join at 100 TB.
  *
  * Writing both sides bucketed on the same key with the same bucket
  * count lets every later join / aggregation on that key plan with NO
  * Exchange: task i reads bucket i of each side, pre-partitioned and
  * pre-sorted on disk. At 100 TB this converts the dominant repeated
  * cost — re-shuffling the spine and payload tables on every query —
  * into a one-time layout cost at write, exactly the trade the
  * reference makes by pre-flattening into per-type files.
  *
  * Bucketing metadata lives in the session catalog (Spark cannot
  * attach it to bare parquet paths), so layouts go through
  * `saveAsTable`; pass `path` to make it an EXTERNAL table at that
  * location — catalog-aware readers get exchange-free, bucket-pruned
  * plans while plain path readers still see ordinary parquet files.
  */
object BucketedLayout {

  /** Write `df` as a bucketed + sorted table. Bucket count is a layout
    * contract: joins co-locate only between tables with the SAME count,
    * so pick it once per key domain, sized so each bucket holds a few
    * hundred MB (e.g. 16384 buckets for a 5 TB table).
    */
  def write(df: DataFrame, table: String, key: String, buckets: Int,
            path: Option[String] = None): Unit =
    writeKeys(df, table, Seq(key), buckets, path)

  /** [[write]] over a composite bucket key (e.g. the near-dup index's
    * (band, bucket)) — co-location requires later joins to use ALL the
    * layout keys as equi-join keys.
    */
  def writeKeys(df: DataFrame, table: String, keys: Seq[String], buckets: Int,
                path: Option[String] = None, mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    require(keys.nonEmpty, "at least one bucket key required")
    // Align the write partitioning with the bucket function:
    // repartition(buckets, keys) and Spark's bucket id share the same
    // murmur3-pmod hash, so a task's rows land in (at most a couple
    // of) matching buckets and each write emits O(buckets) files —
    // measured exactly 1 file/bucket for in-memory appends, ~1.4 for
    // a table-scan rewrite. Without this every write — including each
    // incremental `grow` append — emits tasks × buckets files, and
    // probe cost drifts up with FILE COUNT, not data (IndexBench
    // measured probes degrading 0.70 s → 2.2 s over nine grows at
    // ~1.3k files each; with alignment the same probes hold flat at
    // ~0.3 s across every grow).
    import org.apache.spark.sql.functions.col
    val aligned = df.repartition(buckets, keys.map(col): _*)
    val w = aligned.write.mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*).sortBy(keys.head, keys.tail: _*)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Catalog read-back (the bucketed plan comes from the catalog, not
    * the files — reading the path directly loses the layout).
    */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
