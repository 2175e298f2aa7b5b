package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental cross-corpus near-duplicate detection: a NEW batch of
  * documents probed against an ACCUMULATED base corpus's banded
  * MinHash index — the shape a continuously-ingesting training-data
  * pipeline actually runs ("is this snapshot a near-dup of anything
  * we already kept?"), as opposed to the self-pair dedup of a frozen
  * corpus (LlmQueries.minhashPairs). Complements the streaming
  * near-dup (StreamingOps): same signature/banding scheme (the single
  * MinHashLsh definition), but batch-shaped — a persisted index plus
  * a per-batch equi-join instead of mapGroupsWithState.
  *
  * Scale contract:
  *   - The base index ([[bucketIndex]]) is a (band, bucket, doc_id)
  *     relation — one row per (doc, band), O(base × bands) — that in
  *     production persists as a bucketed table (BucketedLayout on
  *     (band, bucket)) and GROWS by appending each ingested batch's
  *     own bucket rows after it clears dedup; nothing is rebuilt.
  *   - A batch probe costs O(new × bands) map-only work (MinHashSig
  *     native expression) + one equi-join on (band, bucket) against
  *     the co-located index — never a self-pair stage over
  *     base ∪ new, never corpus-sized broadcast. Hot buckets (viral
  *     boilerplate) skew the join; AQE skew-join splits them, and the
  *     candidate DISTINCT bounds re-emits from multi-band collisions.
  *   - Confirmation joins candidates back to the two sides' shingle
  *     arrays and intersects exactly — candidates only, never the
  *     corpus product. Confirmed ⊆ exact cross pairs: misses are
  *     recall losses priced by the scheme's S-curve
  *     (LshTuning.MinHashScheme.recallAt), phantoms are impossible.
  */
object IncrementalDedup {

  /** (doc_id, sig, band, bucket) — THE banded-signature derivation.
    * The batch pair generator (LlmQueries.minhashPairsFrom), the
    * streaming near-dup (StreamingOps.bandDocs) and this operator's
    * index all route through it, so no two of them can ever disagree
    * on what a bucket is — the invariant the stream→batch index
    * bridge rests on. Empty/null shingle sets index nothing — they
    * can near-dup nothing, the self-pair pipeline's filter.
    */
  def bandedSignatures(sets: DataFrame, idCol: String, setCol: String,
      scheme: LshTuning.MinHashScheme): DataFrame =
    sets.filter(size(col(setCol)) > 0)
      .select(col(idCol).as("doc_id"),
        graft.queries.MinHashLsh.signature(col(setCol), scheme.numHashes).as("sig"))
      .select(col("doc_id"), col("sig"), explode(
        graft.queries.MinHashLsh.bandBuckets(col("sig"), scheme.bands, scheme.rows)).as("bb"))
      .select(col("doc_id"), col("sig"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))

  /** (band, bucket, doc_id) bucket rows of a corpus under `scheme` —
    * [[bandedSignatures]] minus the signature payload (the persisted
    * index doesn't need it; confirm re-reads the shingle arrays).
    */
  def bucketIndex(sets: DataFrame, idCol: String, setCol: String,
      scheme: LshTuning.MinHashScheme): DataFrame =
    bandedSignatures(sets, idCol, setCol, scheme)
      .select(col("band"), col("bucket"), col("doc_id"))

  /** Persist the base index as a bucketed catalog table on
    * (band, bucket) — the layout the probe join keys on — so every
    * later batch probe plans with NO Exchange on the index side: the
    * accumulated corpus (the 100 TB half of the join) is never
    * re-shuffled, only the incoming batch is. Each cleared batch's
    * bucket rows APPEND under the same layout (`grow`) — Spark writes
    * appended files into the same bucket scheme, so co-location
    * survives growth without ever rewriting the index.
    */
  def saveIndex(idx: DataFrame, table: String, buckets: Int,
      path: Option[String] = None): Unit =
    BucketedLayout.writeKeys(idx, table, Seq("band", "bucket"), buckets, path)

  /** Append a cleared batch's bucket rows to a saved index — same
    * bucket spec, Append mode (Spark validates the spec against the
    * catalog's and distributes the new files into the same buckets).
    */
  def grow(idx: DataFrame, table: String, buckets: Int): Unit =
    BucketedLayout.writeKeys(idx, table, Seq("band", "bucket"), buckets,
      None, org.apache.spark.sql.SaveMode.Append)

  /** Maintenance compaction of a grown index: every [[grow]] call
    * adds one file set, and a high-cadence ingest accumulates small
    * files per bucket (the streaming-sink failure mode BagEtl.compact
    * exists for). Rewrites the table under the SAME bucket spec via a
    * shadow table + catalog rename — Spark refuses an in-place
    * overwrite of a table being read. Probe plans (and the no-Exchange
    * property) are unchanged; only the file count drops.
    *
    * Operational contract:
    *   - STOP-THE-WORLD for writers: stop [[grow]] /
    *     StreamingOps.indexSink during compaction. An append landing
    *     between the shadow snapshot and the DROP is deleted with the
    *     original table — silent loss, because the streaming
    *     checkpoint has already committed that batch.
    *   - Crash-safe by resume: the shadow name is deterministic, so a
    *     process killed between DROP and RENAME leaves only the
    *     shadow; the next call (or [[resumeCompaction]] directly)
    *     completes the rename instead of failing on the missing
    *     source table.
    *   - MANAGED tables only: compacting an EXTERNAL (path-backed)
    *     index would strand the original directory while path-based
    *     readers keep reading it — refused loudly; compact external
    *     indexes by writing a new location and switching readers.
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, table: String,
      buckets: Int): Unit = {
    if (resumeCompaction(spark, table)) return
    require(spark.catalog.getTable(table).tableType == "MANAGED",
      s"compactIndex supports MANAGED tables only; '$table' is external — " +
        "write a compacted copy to a new location and repoint readers")
    val tmp = shadowName(table)
    BucketedLayout.writeKeys(BucketedLayout.read(spark, table), tmp,
      Seq("band", "bucket"), buckets)
    spark.sql(s"DROP TABLE ${quoted(table)}")
    spark.sql(s"ALTER TABLE ${quoted(tmp)} RENAME TO ${quoted(table)}")
  }

  /** Finish a compaction interrupted between DROP and RENAME: if only
    * the shadow exists, rename it into place. Returns true if a
    * resume happened (the index is then fully compacted).
    */
  def resumeCompaction(spark: org.apache.spark.sql.SparkSession,
      table: String): Boolean = {
    val shadow = shadowName(table)
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(shadow)) {
      spark.sql(s"ALTER TABLE ${quoted(shadow)} RENAME TO ${quoted(table)}")
      true
    } else false
  }

  private def shadowName(table: String): String = table + "__compacting"

  /** Backtick each dot-separated part — `db.idx` must stay a two-part
    * identifier in the SQL swap statements, not one quoted string.
    */
  private def quoted(table: String): String =
    table.split('.').map(p => s"`$p`").mkString(".")

  /** Candidate (new_id, base_id) pairs: the new batch's bucket rows
    * equi-joined against the base index, DISTINCT across bands.
    */
  def candidates(newSets: DataFrame, idCol: String, setCol: String,
      baseIndex: DataFrame, scheme: LshTuning.MinHashScheme): DataFrame =
    bucketIndex(newSets, idCol, setCol, scheme)
      .withColumnRenamed("doc_id", "new_id")
      .join(baseIndex.withColumnRenamed("doc_id", "base_id"), Seq("band", "bucket"))
      .select(col("new_id"), col("base_id")).distinct()

  /** Confirmed cross-corpus near-dups: (new_id, base_id, jaccard)
    * with exact jaccard >= thresh, candidates generated by the banded
    * index probe. Same shingle integers and the same shared/(na+nb-
    * shared) arithmetic as the self-pair confirm, so results line up
    * with the q27 pair graph restricted to cross pairs.
    */
  def newVsBase(newSets: DataFrame, baseSets: DataFrame, idCol: String,
      setCol: String, scheme: LshTuning.MinHashScheme, thresh: Double): DataFrame = {
    val cand = candidates(newSets, idCol, setCol,
      bucketIndex(baseSets, idCol, setCol, scheme), scheme)
    val a = newSets.select(col(idCol).as("new_id"), col(setCol).as("__id_sa"))
    val b = baseSets.select(col(idCol).as("base_id"), col(setCol).as("__id_sb"))
    cand.join(a, Seq("new_id")).join(b, Seq("base_id"))
      .withColumn("shared", size(array_intersect(col("__id_sa"), col("__id_sb"))))
      .withColumn("jaccard", col("shared").cast("double") /
        (size(col("__id_sa")) + size(col("__id_sb")) - col("shared")))
      .filter(col("jaccard") >= thresh)
      .select(col("new_id"), col("base_id"), col("jaccard"))
  }

  /** Semantic (embedding) analog of [[bucketIndex]]: the accumulated
    * corpus's IVF cell index — (cell, vec_id, embedding, nrm), each
    * vector in its nAssign nearest cells. Persists and grows by
    * appending each cleared batch's rows; the centroids come from the
    * corpus-lifecycle model store (ModelIO), so retrain cadence is a
    * policy knob, never a per-batch cost.
    */
  def cosIndex(vecs: DataFrame, idCol: String, vecCol: String,
      cents: Seq[IvfIndex.Centroid], nAssign: Int): DataFrame = {
    val dot = org.apache.spark.sql.graftfns.VectorFunctions.dot _
    IvfIndex.assignMulti(
        vecs.select(col(idCol).as("vec_id"), col(vecCol).as("embedding")),
        "embedding", cents, nAssign)
      .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
      .select(col("cell"), col("vec_id"), col("embedding"), col("nrm"))
  }

  /** Confirmed semantic cross near-dups (new_id, base_id, cos) with
    * exact cosine >= thresh: the new batch assigns to its nAssign
    * nearest cells and equi-joins the base index on cell — candidates
    * only, never new × base — then confirms with the same
    * left-to-right dot / (l2 · l2) arithmetic as the exact all-pairs
    * reference (bit-equal cos, so confirmed ⊆ exact). Zero-norm
    * vectors pair with nothing, the reference's contract. DISTINCT
    * bounds multi-cell re-emits. Misses are cell-co-location losses
    * (both sides multi-assign shrinks them, q60's trade).
    */
  def newVsBaseCos(newVecs: DataFrame, baseIndex: DataFrame, idCol: String,
      vecCol: String, cents: Seq[IvfIndex.Centroid], nAssign: Int,
      thresh: Double): DataFrame = {
    val dot = org.apache.spark.sql.graftfns.VectorFunctions.dot _
    val probe = cosIndex(newVecs, idCol, vecCol, cents, nAssign)
      .select(col("cell"), col("vec_id").as("new_id"),
        col("embedding").as("__id_ea"), col("nrm").as("__id_na"))
    val idx = baseIndex.select(col("cell"), col("vec_id").as("base_id"),
      col("embedding").as("__id_eb"), col("nrm").as("__id_nb"))
    probe.join(idx, Seq("cell"))
      // Java `nrm > 0` is false for NaN but Spark SQL orders NaN above
      // every double — without the isnan guard a NaN-element embedding
      // would emit (new, base, NaN) phantom pairs the exact reference
      // (whose kernel uses Java comparison) excludes, breaking the
      // confirmed-⊆-exact contract (and q75's subset gate)
      .filter(col("__id_na") > 0 && !isnan(col("__id_na")) &&
        col("__id_nb") > 0 && !isnan(col("__id_nb")))
      .withColumn("cos",
        dot(col("__id_ea"), col("__id_eb")) / (col("__id_na") * col("__id_nb")))
      // !isnan(cos): an Inf-norm vector clears the nrm gate but
      // divides to NaN, which Spark's `>=` accepts and Java's rejects
      .filter(col("cos") >= thresh && !isnan(col("cos")))
      .select(col("new_id"), col("base_id"), col("cos")).distinct()
  }
}
