package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct unordered pairs of rows sharing a key, with bounded
  * per-task state — the scale-safe core of the near-dup suite
  * (n-gram Jaccard, MinHash-LSH band buckets, SimHash blocks, blocked
  * exact all-pairs).
  *
  * The naive inverted-index expansion (`collect_list` per key, expand
  * in-row) holds a whole bucket in one aggregation buffer and emits
  * O(f²) pairs from one task — fine for the median key, fatal for a
  * hot key (one stop-shingle shared by 10⁶ docs = one 10¹²-pair task).
  * This operator routes by bucket size instead:
  *
  *  - keys with `2 ≤ f ≤ cap` members collect in-row as before
  *    (buffer ≤ cap rows, ≤ cap² pairs per task);
  *  - keys with `f > cap` members are hash-split into `⌈f/cap⌉`
  *    blocks; every unordered block pair (bi ≤ bj) becomes its own
  *    reduce group holding ≤ ~2·cap members and emitting ≤ ~cap²
  *    pairs. Replication cost is f·⌈f/cap⌉ rows — the f² pair work is
  *    unavoidable by definition; what matters is that it is spread
  *    over (f/cap)²/2 tasks instead of one.
  *
  * Every unordered pair {x, y} of rows sharing a key is emitted
  * exactly once per key, ordered `pa < pb` by the payload's natural
  * (struct) ordering — callers put the id field first. Pairs sharing
  * several keys appear once per key (q27 counts those; q28/q29
  * `.distinct()` them away).
  */
object KeyedPairs {

  // All internal working columns carry the __kp_ prefix so they can
  // never capture a caller's key column (q29 keys on a column named
  // "blk" — an unprefixed withColumn("blk", ...) would silently
  // REPLACE that grouping key and drop cross-block pairs in the
  // hot-bucket path).
  private val F = "__kp_f"; private val NB = "__kp_nb"; private val BLK = "__kp_blk"
  private val BI = "__kp_bi"; private val BJ = "__kp_bj"; private val ISA = "__kp_isA"
  private val P = "__kp_p"; private val PS = "__kp_ps"; private val PR = "__kp_pr"
  private val AS = "__kp_as"; private val BS = "__kp_bs"

  /** @param df      input rows
    * @param keys    bucket key columns (pairs form within a key)
    * @param payload what each side of a pair carries; the FIRST field
    *                must be a unique, orderable id (pair order + the
    *                block-split hash derive from the whole payload)
    * @param cap     max members expanded in one task (≥ 2)
    * @param maxHotKeys guard on the broadcast hot-key list (below)
    * @return columns `pa`, `pb` (payload type), one row per (key, pair)
    */
  def pairs(df: DataFrame, keys: Seq[String], payload: Column, cap: Int,
            maxHotKeys: Int = 1 << 20): DataFrame =
    pairsGrouped(df, keys, payload, cap, maxHotKeys)
      .select(explode(org.apache.spark.sql.graftfns.PairFunctions
        .pairExpand(col("as_"), col("bs"), col("diag"))).as(PR))
      .select(col(s"$PR.pa").as("pa"), col(s"$PR.pb").as("pb"))

  /** The block-pair GROUPS behind [[pairs]], before pair expansion —
    * the keyed analogue of [[allPairsGrouped]] (round 18): returns
    * `keys..., as_, bs, diag` with `as_`/`bs` the two sides' payload
    * arrays (small buckets: the whole bucket in `as_`, `bs` empty,
    * `diag` true; hot buckets: one row per unordered block pair,
    * `diag` = within-block). Callers that only need a REDUCTION of
    * each bucket's pairs (threshold scoring, per-task top-k) fuse it
    * into one expression over the arrays instead of materializing
    * cap² pair structs per task — for embedding payloads that is the
    * difference between a sparse survivor graph and gigabytes of
    * transient two-embedding pair rows. Same routing machinery as
    * [[pairs]] (hot-key counting pass + bounded blocks + maxHotKeys
    * guard); [[pairs]] itself is the pairExpand of this relation.
    */
  def pairsGrouped(df: DataFrame, keys: Seq[String], payload: Column, cap: Int,
                   maxHotKeys: Int = 1 << 20): DataFrame = {
    require(cap >= 2, s"cap must be >= 2, got $cap")
    require(!keys.exists(Set("as_", "bs", "diag")),
      "key columns may not be named as_/bs/diag (the grouped output columns)")
    require(maxHotKeys >= 1, s"maxHotKeys must be >= 1, got $maxHotKeys")
    require(keys.forall(!_.startsWith("__kp_")), "key columns may not use the __kp_ prefix")
    val k = keys.map(col)
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val rows = df.select(k :+ payload.as(P): _*)

    // bucket sizes first: a bounded count-agg (map-side partial).
    // Only the keys ABOVE the cap are materialized and broadcast —
    // hot keys are rare by definition (if a workload makes them
    // common, raise the cap or pre-drop stop-keys). That
    // broadcast-sized assumption is GUARDED, not hoped for: the hot
    // list is collected once, UNSORTED with a bounded limit
    // (CollectLimit — early-out, no per-partition top-k heap: the
    // first guard shipped as orderBy(desc).limit(1M), which planned a
    // TakeOrdered that built a million-row heap per partition and
    // merged nPart×1M rows on the driver on EVERY build — a 5× tax on
    // the amplified jaccard graph for a diagnostic that only matters
    // on the failure path). A pathological corpus still fails loudly:
    // the top offenders are fetched by a SEPARATE small query only
    // after the guard trips. The collected list then feeds both
    // routing joins as a LocalRelation, so the size aggregation runs
    // exactly once instead of once per broadcast. Routing is two
    // map-side broadcast joins: no shuffle join of the full input
    // against its sizes.
    val hotAgg = rows.groupBy(k: _*).agg(count(lit(1)).as(F)).filter(col(F) > cap)
    val hotRows = hotAgg.limit(maxHotKeys + 1).collect()
    if (hotRows.length > maxHotKeys) {
      val sample = hotAgg.orderBy(col(F).desc).limit(5).collect().map { r =>
        val kv = keys.zipWithIndex.map { case (n, i) => s"$n=${r.get(i)}" }.mkString(", ")
        s"($kv) -> ${r.getLong(keys.length)} members"
      }.mkString("; ")
      throw new IllegalArgumentException(
        s"KeyedPairs: more than $maxHotKeys keys exceed cap=$cap — the hot-key list " +
        s"would not be broadcast-safe. Largest buckets: $sample. Raise cap, pre-drop " +
        "stop-keys, or raise maxHotKeys if the driver can hold the list.")
    }
    val hot = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(hotRows: _*),
      org.apache.spark.sql.types.StructType(
        keys.map(n => rows.schema(n)) :+
        org.apache.spark.sql.types.StructField(F, org.apache.spark.sql.types.LongType, nullable = false)))

    // -- small buckets (everything not hot): whole bucket in one
    // group, buffer ≤ cap guaranteed by the anti join. The explicit
    // repartition keeps the (byte-light) downstream work wide: AQE
    // would coalesce the tiny post-agg shuffle to one partition and
    // serialize the compute.
    val emptyPs = array().cast(
      org.apache.spark.sql.types.ArrayType(rows.schema(P).dataType))
    val small = rows.join(broadcast(hot.select(k: _*)), keys, "left_anti")
      .groupBy(k: _*).agg(collect_list(col(P)).as(AS))
      .repartition(nPart, k: _*)
      .select(k ++ Seq(col(AS).as("as_"), emptyPs.as("bs"),
        lit(true).as("diag")): _*)

    // -- big buckets: split members into nb = ⌈f/cap⌉ hash-blocks.
    // A row in block b joins group (b, j) for all j ≥ b as the A side,
    // and group (i, b) for all i < b as the B side; so each unordered
    // block pair is one group, the diagonal group (b, b) holds the
    // block itself once (A side only).
    val big = rows.join(broadcast(hot), keys)  // attaches f, map-side
      .withColumn(NB, ceil(col(F) / lit(cap)).cast("int"))
      .withColumn(BLK, pmod(xxhash64(col(P)), col(NB)).cast("int"))
    val aSide = big.select(k ++ Seq(col(BLK).as(BI),
      explode(sequence(col(BLK), col(NB) - 1)).as(BJ),
      col(P), lit(true).as(ISA)): _*)
    val bSide = big
      .filter(col(BLK) > 0)  // sequence(0, -1) would count DOWN
      .select(k ++ Seq(explode(sequence(lit(0), col(BLK) - 1)).as(BI),
        col(BLK).as(BJ), col(P), lit(false).as(ISA)): _*)
    val grouped = aSide.unionByName(bSide)
      .groupBy(k ++ Seq(col(BI), col(BJ)): _*)
      // collect_list skips nulls: each side's members, ≤ ~cap each
      .agg(collect_list(when(col(ISA), col(P))).as(AS),
           collect_list(when(!col(ISA), col(P))).as(BS))
      .repartition(nPart, k ++ Seq(col(BI), col(BJ)): _*)
      // within-block (bi == bj) and cross-block groups in one stream
      // (blocks differ => x ≠ y on the cross arm)
      .select(k ++ Seq(col(AS).as("as_"), col(BS).as("bs"),
        (col(BI) === col(BJ)).as("diag")): _*)

    small.unionByName(grouped)
  }

  /** [[pairs]] for callers that ALREADY KNOW each key's bucket size —
    * e.g. DupCollapse members, which carry the group's member count on
    * every row. The two-pass hot-key machinery above exists only to
    * LEARN the sizes (one counting pass + a driver collect + two
    * broadcast routing joins); with the size on the row, routing is a
    * pure map-side filter — one pass over the input, no eager job, no
    * driver state, no broadcast, and no maxHotKeys ceiling (nothing is
    * collected, so any number of over-cap keys is fine). Same output
    * contract as [[pairs]]: every unordered pair of rows sharing a key,
    * exactly once per key, `pa < pb` by payload order.
    *
    * @param sizeCol the EXACT number of rows sharing this row's key —
    *                wrong sizes break the routing (an undersized hot
    *                bucket lands whole on the single-task path; an
    *                oversized small bucket splits needlessly but stays
    *                correct)
    */
  def pairsPresized(df: DataFrame, keys: Seq[String], sizeCol: Column,
                    payload: Column, cap: Int): DataFrame = {
    require(cap >= 2, s"cap must be >= 2, got $cap")
    require(keys.forall(!_.startsWith("__kp_")), "key columns may not use the __kp_ prefix")
    val k = keys.map(col)
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val rows = df.select(k ++ Seq(sizeCol.cast("long").as(F), payload.as(P)): _*)

    val emptyPs = array().cast(
      org.apache.spark.sql.types.ArrayType(rows.schema(P).dataType))
    val small = rows.filter(col(F) <= cap)
      .groupBy(k: _*).agg(collect_list(col(P)).as(PS))
      .repartition(nPart, k: _*)
      .select(explode(org.apache.spark.sql.graftfns.PairFunctions
        .pairExpand(col(PS), emptyPs, lit(true))).as(PR))

    val big = rows.filter(col(F) > cap)
      .withColumn(NB, ceil(col(F) / lit(cap)).cast("int"))
      .withColumn(BLK, pmod(xxhash64(col(P)), col(NB)).cast("int"))
    val aSide = big.select(k ++ Seq(col(BLK).as(BI),
      explode(sequence(col(BLK), col(NB) - 1)).as(BJ),
      col(P), lit(true).as(ISA)): _*)
    val bSide = big
      .filter(col(BLK) > 0)
      .select(k ++ Seq(explode(sequence(lit(0), col(BLK) - 1)).as(BI),
        col(BLK).as(BJ), col(P), lit(false).as(ISA)): _*)
    val grouped = aSide.unionByName(bSide)
      .groupBy(k ++ Seq(col(BI), col(BJ)): _*)
      .agg(collect_list(when(col(ISA), col(P))).as(AS),
           collect_list(when(!col(ISA), col(P))).as(BS))
      .repartition(nPart, k ++ Seq(col(BI), col(BJ)): _*)
    val bigPairs = grouped.select(explode(
      org.apache.spark.sql.graftfns.PairFunctions
        .pairExpand(col(AS), col(BS), col(BI) === col(BJ))).as(PR))

    small.unionByName(bigPairs)
      .select(col(s"$PR.pa").as("pa"), col(s"$PR.pb").as("pb"))
  }

  /** All unordered pairs of the WHOLE table — the degenerate
    * one-bucket case, for exact all-pairs similarity. A keyed call
    * with a constant key would plan the size lookup as a trivially-true
    * nested-loop join (the optimizer folds `lit = lit` away); here the
    * member count is read once up front instead, making the block
    * count a literal: the whole plan is two projections, one shuffle
    * on (bi, bj), and bounded in-task expansion — nothing broadcast,
    * no join.
    */
  def allPairs(df: DataFrame, payload: Column, cap: Int): DataFrame =
    allPairsGrouped(df, payload, cap)
      .select(explode(org.apache.spark.sql.graftfns.PairFunctions
        .pairExpand(col("as_"), col("bs"), col("bi") === col("bj"))).as("pr"))
      .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))

  /** The block-pair GROUPS behind [[allPairs]], before pair expansion:
    * (bi, bj, as_, bs) with as_/bs the two sides' payload arrays
    * (diagonal groups have bs empty). Exposed so callers that only
    * need a REDUCTION of each group's pairs (per-task top-k scoring,
    * counting) can fuse it into one expression over the arrays instead
    * of materializing cap² pair structs per task — the shuffle after
    * the fused op carries the reduced rows only.
    */
  def allPairsGrouped(df: DataFrame, payload: Column, cap: Int): DataFrame =
    allPairsGrouped(df, payload, cap, df.select(payload.as("p")).count())

  /** [[allPairsGrouped]] with a caller-supplied row count — for
    * callers that already hold the count (memoized corpus statistics),
    * so block sizing costs no eager counting job. `n` only sizes the
    * block grid: an ESTIMATE is safe for correctness (every pair is
    * still emitted exactly once for any nb >= 1) — an underestimate
    * grows per-task members beyond cap by the same factor, an
    * overestimate multiplies the row-replication shuffle, so callers
    * should stay within a small factor of the truth.
    */
  def allPairsGrouped(df: DataFrame, payload: Column, cap: Int, n: Long): DataFrame = {
    require(cap >= 2, s"cap must be >= 2, got $cap")
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val rows = df.select(payload.as("p"))
    val nb = math.max(1L, (n + cap - 1) / cap).toInt
    val withBlk = rows.withColumn("blk", pmod(xxhash64(col("p")), lit(nb)).cast("int"))
    val aSide = withBlk.select(col("blk").as("bi"),
      explode(sequence(col("blk"), lit(nb - 1))).as("bj"), col("p"), lit(true).as("isA"))
    val bSide = withBlk.filter(col("blk") > 0)
      .select(explode(sequence(lit(0), col("blk") - 1)).as("bi"),
        col("blk").as("bj"), col("p"), lit(false).as("isA"))
    aSide.unionByName(bSide)
      .groupBy(col("bi"), col("bj"))
      .agg(collect_list(when(col("isA"), col("p"))).as("as_"),
           collect_list(when(!col("isA"), col("p"))).as("bs"))
      .repartition(nPart, col("bi"), col("bj"))
  }
}
