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
  *     boilerplate) skew the join; AQE skew-join splits them when the
  *     index derives in-query (both sides shuffle — spec-pinned), the
  *     salted probe ([[candidatesSalted]]) bounds them against the
  *     persisted bucketed index (whose exchange-free scan AQE cannot
  *     split), and the candidate DISTINCT bounds re-emits from
  *     multi-band collisions.
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

  /** Table property carrying the MinHash scheme the index's bucket
    * rows were derived under ("numHashes,bands,rows"). The stamp is
    * the index's CONTRACT, not documentation: bucket keys are
    * meaningless outside their scheme, and the production failure mode
    * is silent — a corpus growing across an LshTuning.minhashScheme
    * threshold (100k / 10M docs) flips the derived scheme, new probes
    * hash into different bucket keys, the equi-join matches nothing,
    * and candidate recall collapses with no error anywhere. Every
    * write stamps; every stamped-table operation `require`s a match.
    */
  private[graft] val SchemeProp = "graft.minhash.scheme"

  /** Centroid-set fingerprint of a persisted semantic index (semantic
    * twin of [[SchemeProp]]): cell assignments are meaningless under
    * any other centroid set, and a retrain otherwise strands every
    * accumulated row under stale cells with nothing to catch it.
    */
  private[graft] val CentroidProp = "graft.ivf.centroids"

  /** nAssign the semantic index rows were built with — part of the
    * recall contract (an index holding 1 cell/vec probed as if it held
    * 2 silently halves co-location recall), so guarded like the rest.
    */
  private[graft] val NAssignProp = "graft.ivf.nassign"

  private def fmtScheme(s: LshTuning.MinHashScheme): String =
    s"${s.numHashes},${s.bands},${s.rows}"

  private def parseScheme(s: String): LshTuning.MinHashScheme =
    s.split(',') match {
      case Array(n, b, r) => LshTuning.MinHashScheme(n.trim.toInt, b.trim.toInt, r.trim.toInt)
      case _ => throw new IllegalArgumentException(s"malformed scheme stamp '$s'")
    }

  /** Order-sensitive bit-exact fingerprint of a centroid set: MD5 over
    * (id, floatToIntBits(vec)*) per centroid. Any retrain — even one
    * converging to visually-identical centroids — changes at least one
    * bit and therefore the stamp, which is the point: cell ids are only
    * comparable under the EXACT floats that assigned them.
    */
  def centroidFingerprint(cents: Seq[IvfIndex.Centroid]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(4)
    def putInt(i: Int): Unit = { buf.clear(); buf.putInt(i); md.update(buf.array()) }
    cents.foreach { c =>
      putInt(c.id)
      c.vec.foreach(f => putInt(java.lang.Float.floatToIntBits(f)))
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  private def catalogMeta(spark: org.apache.spark.sql.SparkSession, table: String) =
    spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))

  /** The persisted layout spec (bucket columns, count) — read from the
    * catalog, never trusted from a caller argument: a wrong count
    * silently rewrites the index under a new layout on the next
    * maintenance op and breaks the no-Exchange probe property.
    */
  private def layoutSpec(spark: org.apache.spark.sql.SparkSession, table: String)
      : org.apache.spark.sql.catalyst.catalog.BucketSpec =
    catalogMeta(spark, table).bucketSpec.getOrElse(throw new IllegalStateException(
      s"'$table' has no bucket spec — not a graft dedup index"))

  private def stampProps(spark: org.apache.spark.sql.SparkSession, table: String,
      props: Map[String, String]): Unit = {
    val kv = props.toSeq.sorted.map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
    spark.sql(s"ALTER TABLE ${quoted(table)} SET TBLPROPERTIES ($kv)")
    ()
  }

  private def stampOf(spark: org.apache.spark.sql.SparkSession, table: String,
      prop: String): String =
    catalogMeta(spark, table).properties.getOrElse(prop,
      throw new IllegalStateException(
        s"index '$table' carries no '$prop' stamp — it predates scheme " +
          "stamping or is not a graft dedup index; rebuild it (or migrate " +
          "with rebandIndex/recellIndex) before probing"))

  /** The scheme a stamped index was built under. */
  def indexScheme(spark: org.apache.spark.sql.SparkSession, table: String)
      : LshTuning.MinHashScheme = parseScheme(stampOf(spark, table, SchemeProp))

  /** Guard: the caller's scheme must be the one the index was built
    * under — otherwise the probe's bucket keys are hashed under a
    * different banding and the equi-join silently matches nothing.
    */
  private def requireScheme(spark: org.apache.spark.sql.SparkSession,
      table: String, scheme: LshTuning.MinHashScheme): Unit = {
    val stamped = indexScheme(spark, table)
    require(stamped == scheme,
      s"index '$table' was built under MinHash scheme (${fmtScheme(stamped)}) " +
        s"but this operation derives buckets under (${fmtScheme(scheme)}); " +
        "probing or growing across schemes silently zeroes candidate recall — " +
        "migrate the index with rebandIndex(newScheme) first")
  }

  private def requireCentroids(spark: org.apache.spark.sql.SparkSession,
      table: String, cents: Seq[IvfIndex.Centroid], nAssign: Int): Unit = {
    val stamped = stampOf(spark, table, CentroidProp)
    val now = centroidFingerprint(cents)
    require(stamped == now,
      s"semantic index '$table' was built under centroid set $stamped but " +
        s"this operation assigns cells under centroid set $now (a retrain " +
        "strands accumulated rows in stale cells); migrate with " +
        "recellIndex(newCentroids) first")
    val stampedN = stampOf(spark, table, NAssignProp).toInt
    require(stampedN == nAssign,
      s"semantic index '$table' holds nAssign=$stampedN cells per vector " +
        s"but this operation assumes nAssign=$nAssign — recall contracts " +
        "differ; rebuild or migrate with recellIndex")
  }

  /** Persist the base index as a bucketed catalog table on
    * (band, bucket) — the layout the probe join keys on — so every
    * later batch probe plans with NO Exchange on the index side: the
    * accumulated corpus (the 100 TB half of the join) is never
    * re-shuffled, only the incoming batch is. Each cleared batch's
    * bucket rows APPEND under the same layout (`grow`) — Spark writes
    * appended files into the same bucket scheme, so co-location
    * survives growth without ever rewriting the index. The building
    * scheme is stamped into table properties ([[SchemeProp]]); later
    * grows and probes refuse a different one.
    */
  def saveIndex(idx: DataFrame, table: String, buckets: Int,
      scheme: LshTuning.MinHashScheme, path: Option[String] = None): Unit = {
    BucketedLayout.writeKeys(idx, table, Seq("band", "bucket"), buckets, path)
    stampProps(idx.sparkSession, table, Map(SchemeProp -> fmtScheme(scheme)))
  }

  /** Append a cleared batch's bucket rows to a saved index — bucket
    * spec read from the catalog (same layout; Spark distributes the
    * new files into the same buckets), Append mode. Refuses rows
    * derived under a scheme other than the index's stamp.
    */
  def grow(idx: DataFrame, table: String,
      scheme: LshTuning.MinHashScheme): Unit = {
    val spark = idx.sparkSession
    requireScheme(spark, table, scheme)
    val spec = layoutSpec(spark, table)
    BucketedLayout.writeKeys(idx, table, spec.bucketColumnNames, spec.numBuckets,
      None, org.apache.spark.sql.SaveMode.Append)
  }

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
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    if (resumeCompaction(spark, table)) return
    // Read the table's FILES as a bare parquet path, not the catalog
    // table: the catalog scan advertises the bucket partitioning, so
    // EnsureRequirements drops the shadow write's aligning repartition
    // as redundant — while the bucketed scan itself is independently
    // reverted to bin-packed file splits (nothing downstream "needs"
    // the partitioning once the exchange is gone), leaving the rewrite
    // misaligned (~6 buckets per task = ~6x the post-compact file
    // count). A path read carries no partitioning claim, so the
    // repartition survives and compaction lands at O(buckets) files —
    // the whole point of the operation. (IndexBench: 288 grown files
    // compacted to 190 via the catalog read, 32 via the path read.)
    val location = catalogMeta(spark, table).location.toString
    rewriteInPlace(spark, table, Map.empty)(
      () => spark.read.parquet(location))
  }

  /** Shadow-table rewrite under the table's OWN catalog layout spec
    * (bucket columns + count are never caller-supplied — a wrong count
    * would silently relayout the index and break the no-Exchange probe
    * property). The original's graft.* stamps carry over, overridden
    * by `newProps` — and the shadow is FULLY built and stamped before
    * the original is dropped, so a crash at any point leaves either
    * the intact original (plus a dead shadow the next rewrite
    * overwrites) or only the committed shadow (resumeCompaction
    * renames it into place).
    */
  private def rewriteInPlace(spark: org.apache.spark.sql.SparkSession,
      table: String, newProps: Map[String, String])(rows: () => DataFrame): Unit = {
    require(spark.catalog.getTable(table).tableType == "MANAGED",
      s"in-place index rewrite supports MANAGED tables only; '$table' is " +
        "external — write a rewritten copy to a new location and repoint readers")
    val spec = layoutSpec(spark, table)
    val stamps = catalogMeta(spark, table).properties
      .filter { case (k, _) => k.startsWith("graft.") }
    val tmp = shadowName(table)
    BucketedLayout.writeKeys(rows(), tmp, spec.bucketColumnNames, spec.numBuckets)
    val props = stamps ++ newProps
    if (props.nonEmpty) stampProps(spark, tmp, props)
    spark.sql(s"DROP TABLE ${quoted(table)}")
    spark.sql(s"ALTER TABLE ${quoted(tmp)} RENAME TO ${quoted(table)}")
    ()
  }

  /** Batch index migration across banding schemes — the growth path
    * the incremental operator exists for: when the accumulated corpus
    * crosses an LshTuning.minhashScheme threshold (100k / 10M docs),
    * the right banding changes, and an index frozen on the old scheme
    * either blocks ingestion (the stamp guard refuses mismatched
    * grows) or — unstamped — silently loses probe recall. This is the
    * batch twin of StreamingOps.rebandNearDupState: re-derive the
    * bucket rows from the corpus's staged shingle sets under the new
    * scheme and swap them in (shadow + rename, [[rewriteInPlace]]'s
    * crash contract), restamping [[SchemeProp]]. `sets` must cover the
    * full accumulated corpus (the same relation whose batches built
    * the index) — the index itself holds only bucket keys, which are
    * not invertible to signatures.
    */
  def rebandIndex(spark: org.apache.spark.sql.SparkSession, table: String,
      sets: DataFrame, idCol: String, setCol: String,
      newScheme: LshTuning.MinHashScheme): Unit = {
    resumeCompaction(spark, table)
    rewriteInPlace(spark, table, Map(SchemeProp -> fmtScheme(newScheme)))(
      () => bucketIndex(sets, idCol, setCol, newScheme))
  }

  /** Semantic-index migration after a centroid retrain: re-assign the
    * accumulated corpus's vectors under the new centroid set and swap
    * the cell rows in, restamping [[CentroidProp]]/[[NAssignProp]].
    * Same shadow-swap crash contract as [[rebandIndex]]; `vecs` must
    * cover the full accumulated corpus.
    */
  def recellIndex(spark: org.apache.spark.sql.SparkSession, table: String,
      vecs: DataFrame, idCol: String, vecCol: String,
      newCents: Seq[IvfIndex.Centroid], nAssign: Int): Unit = {
    resumeCompaction(spark, table)
    rewriteInPlace(spark, table, Map(
      CentroidProp -> centroidFingerprint(newCents),
      NAssignProp -> nAssign.toString))(
      () => cosIndex(vecs, idCol, vecCol, newCents, nAssign))
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
    *
    * Hot-bucket (viral boilerplate) skew, precisely: when `baseIndex`
    * is derived IN-QUERY (both join inputs shuffle), AQE's skew-join
    * splits an oversized (band, bucket) partition at runtime —
    * IncrementalDedupSpec pins that with a synthetic 10⁴-member
    * bucket. When `baseIndex` is the PERSISTED bucketed table, there
    * is no exchange on the index side for AQE to split (that absence
    * is the whole point of the layout), so runtime skew handling
    * cannot engage — a known-viral corpus should probe through
    * [[candidatesSalted]], which trades the exchange-free scan for
    * explicitly bounded per-task key groups.
    */
  def candidates(newSets: DataFrame, idCol: String, setCol: String,
      baseIndex: DataFrame, scheme: LshTuning.MinHashScheme): DataFrame =
    bucketIndex(newSets, idCol, setCol, scheme)
      .withColumnRenamed("doc_id", "new_id")
      .join(baseIndex.withColumnRenamed("doc_id", "base_id"), Seq("band", "bucket"))
      .select(col("new_id"), col("base_id")).distinct()

  /** [[candidates]] with the hot-key concentration salted away: the
    * index side takes a deterministic per-row salt, the (small) batch
    * side replicates once per salt value, and the join key becomes
    * (band, bucket, salt) — a 10⁶-member viral bucket spreads across
    * `salts` tasks instead of landing in one. Same rows as
    * [[candidates]] (spec-pinned). This is the explicit fallback for
    * probing a PERSISTED bucketed index over a known-viral corpus:
    * the salt extends the join key past the table's layout keys, so
    * the index side DOES re-shuffle here — bounded task size is what
    * that exchange buys.
    */
  def candidatesSalted(newSets: DataFrame, idCol: String, setCol: String,
      baseIndex: DataFrame, scheme: LshTuning.MinHashScheme,
      salts: Int): DataFrame =
    SaltedJoin.applyKeys(
        baseIndex.withColumnRenamed("doc_id", "base_id"),
        bucketIndex(newSets, idCol, setCol, scheme)
          .withColumnRenamed("doc_id", "new_id"),
        Seq("band", "bucket"), col("base_id"), salts)
      .select(col("new_id"), col("base_id")).distinct()

  /** [[candidatesSalted]] against a PERSISTED stamped index — the
    * guarded form the operator docs direct viral corpora to: the
    * scheme stamp is checked exactly as in [[candidatesIn]] (the
    * salted path must not reopen the silent-recall hole the stamps
    * close).
    */
  def candidatesSaltedIn(spark: org.apache.spark.sql.SparkSession, table: String,
      newSets: DataFrame, idCol: String, setCol: String,
      scheme: LshTuning.MinHashScheme, salts: Int): DataFrame = {
    requireScheme(spark, table, scheme)
    candidatesSalted(newSets, idCol, setCol, BucketedLayout.read(spark, table),
      scheme, salts)
  }

  /** [[candidates]] against a PERSISTED stamped index: refuses a
    * scheme other than the table's stamp before deriving a single
    * bucket — the guard that turns the silent-recall-collapse failure
    * (scheme drift across a corpus-size threshold) into a loud one.
    */
  def candidatesIn(spark: org.apache.spark.sql.SparkSession, table: String,
      newSets: DataFrame, idCol: String, setCol: String,
      scheme: LshTuning.MinHashScheme): DataFrame = {
    requireScheme(spark, table, scheme)
    candidates(newSets, idCol, setCol, BucketedLayout.read(spark, table), scheme)
  }

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

  /** Persist a [[cosIndex]] as a bucketed catalog table on `cell` (the
    * probe's equi-join key, so the index side plans exchange-free like
    * the MinHash twin), stamped with the building centroid set's
    * fingerprint and nAssign — the cell assignments are only
    * comparable under those exact centroids.
    */
  def saveCosIndex(idx: DataFrame, table: String, buckets: Int,
      cents: Seq[IvfIndex.Centroid], nAssign: Int,
      path: Option[String] = None): Unit = {
    BucketedLayout.writeKeys(idx, table, Seq("cell"), buckets, path)
    stampProps(idx.sparkSession, table, Map(
      CentroidProp -> centroidFingerprint(cents),
      NAssignProp -> nAssign.toString))
  }

  /** Append a cleared batch's cell rows — layout from the catalog,
    * refused under any centroid set or nAssign other than the stamp.
    */
  def growCosIndex(idx: DataFrame, table: String,
      cents: Seq[IvfIndex.Centroid], nAssign: Int): Unit = {
    val spark = idx.sparkSession
    requireCentroids(spark, table, cents, nAssign)
    val spec = layoutSpec(spark, table)
    BucketedLayout.writeKeys(idx, table, spec.bucketColumnNames, spec.numBuckets,
      None, org.apache.spark.sql.SaveMode.Append)
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

  /** [[newVsBaseCos]] against a PERSISTED stamped semantic index:
    * refuses a centroid set or nAssign other than the table's stamp —
    * a retrain otherwise silently probes stale cells.
    */
  def newVsBaseCosIn(spark: org.apache.spark.sql.SparkSession, table: String,
      newVecs: DataFrame, idCol: String, vecCol: String,
      cents: Seq[IvfIndex.Centroid], nAssign: Int, thresh: Double): DataFrame = {
    requireCentroids(spark, table, cents, nAssign)
    newVsBaseCos(newVecs, BucketedLayout.read(spark, table), idCol, vecCol,
      cents, nAssign, thresh)
  }
}
