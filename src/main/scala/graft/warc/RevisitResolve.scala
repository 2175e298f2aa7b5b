package graft.warc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfns.WarcDigest.warcDigest

/** Resolve WARC `revisit` records against the response spine — the
  * crawl-NATIVE exact-dedup signal. Common Crawl (and every
  * deduplicating crawler) stores a page's body ONCE; later identical
  * re-fetches land as `warc_type=revisit` records carrying only
  * `WARC-Payload-Digest` (sha1:base32 of the payload they matched)
  * and `WARC-Refers-To` (the stored record's id). A pipeline that
  * ignores them under-counts duplication; one that re-crawls
  * full-body copies pays extraction per copy. Resolution joins the
  * two on the digest the crawler itself computed:
  *
  *   - [[resolve]]: response rows + a `copies` column (1 + matching
  *     revisit count) — downstream extraction/dedup then runs ONCE
  *     per stored page and weighs it by its true fetch multiplicity.
  *   - [[dangling]]: revisit rows whose digest matches no response
  *     in the frame — visible, not silently dropped (a truncated
  *     shard set or a cross-segment referent is an auditable
  *     condition, the loud-ingestion contract's shape).
  *
  * Scale shape: the revisit side collapses to (digest, count) via a
  * partial-aggregable groupBy BEFORE the join, so the join's build
  * volume is distinct-digest-sized; both sides shuffle once on the
  * digest key (the aggregate's partitioning is reusable by the join).
  * The digest for the response side is computed natively
  * ([[org.apache.spark.sql.graftfns.WarcDigest]], codegen) — one
  * sha1 per stored page, not per copy.
  *
  * Reference trace: rosbag2parquet README.md:2's query-enablement
  * thesis — the dedup signal the container already carries should be
  * a join, not a recompute.
  */
object RevisitResolve {

  /** Split a raw `format("warc")` frame on `warc_type` and resolve:
    * every `response` row comes back (all its columns preserved) plus
    * `copies` = 1 + the number of revisit records whose
    * `payload_digest` equals the response payload's own sha1:base32
    * digest. Revisits with a NULL digest header cannot be attributed
    * and are ignored here (they remain visible in [[dangling]]).
    */
  def resolve(crawl: DataFrame): DataFrame = {
    val resp = crawl.filter(col("warc_type") === "response")
      // internal working columns are namespaced: withColumn silently
      // REPLACES a same-named user column (the KeyedPairs lesson)
      .withColumn("__rr_digest", warcDigest(col("payload")))
    val revs = crawl.filter(col("warc_type") === "revisit" &&
        col("payload_digest").isNotNull)
      .groupBy(col("payload_digest").as("__rr_digest"))
      .agg(count(lit(1)).as("__rr_revisits"))
    resp.join(revs, Seq("__rr_digest"), "left_outer")
      .withColumn("copies",
        lit(1L) + coalesce(col("__rr_revisits"), lit(0L)))
      .drop("__rr_digest", "__rr_revisits")
  }

  /** Revisit rows whose digest matches no response payload in the
    * frame (left-anti on the computed response digests) — the audit
    * view of referents lost to truncation or living in shards outside
    * this read.
    */
  def dangling(crawl: DataFrame): DataFrame = {
    val respDigests = crawl.filter(col("warc_type") === "response")
      .select(warcDigest(col("payload")).as("__rr_digest"))
    crawl.filter(col("warc_type") === "revisit")
      .join(respDigests,
        col("payload_digest") === col("__rr_digest"), "left_anti")
  }
}
