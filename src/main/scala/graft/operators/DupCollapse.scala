package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-duplicate clique collapse for set-keyed pair generation.
  *
  * The near-dup pair queries (n-gram Jaccard, winnowing fingerprints)
  * compute pair statistics that are pure functions of each document's
  * shingle/fingerprint SET: `shared(a, b) = |S(a) ∩ S(b)|`,
  * `jaccard(a, b) = |∩| / |∪|`. Documents with identical sets are
  * therefore interchangeable in the pair stage — and real crawled
  * corpora are FULL of identical documents (boilerplate, mirrors,
  * reposts; the amplified bench models the worst case as ×10 exact
  * cliques). Running the inverted-index pair expansion over every
  * copy multiplies the intermediate (key, pair) volume by the SQUARE
  * of the duplication factor: a ×10 clique corpus pays ×100 pair
  * rows for pair values it already knows.
  *
  * This operator collapses rows with an identical set into one group
  * keyed by the canonical (sorted) set, so callers can
  *
  *   1. run the quadratic pair stage over one REPRESENTATIVE per
  *      group ([[Collapsed.groups]]: `gid` = min member id),
  *   2. emit within-group pairs directly — every member pair of a
  *      group shares the whole set, so the pair stats are group
  *      constants ([[withinPairs]]), and
  *   3. expand the representative-level pair results to all member
  *      cross products ([[expandPairs]]).
  *
  * The collapse itself is one shuffle keyed by the sorted set (plus
  * the join-back for membership); the pair stage then scales with
  * DISTINCT documents, not total documents. Output is row-identical
  * to running the pair stage over the raw corpus because group
  * membership ⇒ set equality ⇒ equal pair stats (proved on testdata
  * by DupCollapseSpec, which diffs both plans).
  *
  * Scale shape: no collect, no broadcast of corpus-sized state, no
  * unbounded per-task buffers — membership attaches via a shuffle
  * join on the set key, within-group expansion goes through
  * [[KeyedPairs]] (block-split past `cap`, so a 10⁶-copy viral
  * clique becomes bounded block tasks), and result expansion is two
  * shuffle joins on group ids.
  */
object DupCollapse {

  /** @param groups  one row per distinct set: `gid` (min member id),
    *                `key` (the sorted set), `m` (member count),
    *                `n` (set size; -1 for a null set)
    * @param members one row per input row: `gid`, `id`, `m`, `n`
    */
  final case class Collapsed(groups: DataFrame, members: DataFrame)

  /** Collapse `df` rows whose `setCol` holds an identical set.
    * `setCol` must be array-typed with per-row-distinct elements —
    * ENFORCED: the within-group stats assume set semantics (a shared
    * count of n means n distinct shared elements), so a multiset input
    * would return plausible-looking but wrong pair stats. A repeated
    * element raises at execution time instead (one extra O(k) pass per
    * row, small next to the signature/pair work downstream); multiset
    * call sites belong on [[collapseExact]], whose verbatim key makes
    * no set assumption. `idCol` must be unique and orderable. Null and
    * empty arrays form groups like any other value (`n` ≤ 0) — the
    * pair paths drop them before expansion ([[withinPairs]] `minN`;
    * the rep explode emits nothing for them), mirroring the raw
    * pipeline's explode().
    */
  def collapse(df: DataFrame, idCol: String, setCol: String): Collapsed = {
    val c = col(setCol)
    val guarded = when(c.isNull || size(array_distinct(c)) === size(c),
        array_sort(c))
      .otherwise(raise_error(concat(
        lit(s"DupCollapse.collapse: '$setCol' holds repeated elements (row id "),
        col(idCol).cast("string"),
        lit(") — set semantics required; use collapseExact for multiset keys"))))
    collapseBy(df, idCol, guarded)
  }

  /** [[collapse]] with the key taken VERBATIM — for ordered arrays
    * where element position is meaningful (embedding vectors: two
    * docs are duplicates only if the vectors are element-wise equal;
    * sorting would conflate different vectors with equal multisets).
    */
  def collapseExact(df: DataFrame, idCol: String, keyCol: String): Collapsed =
    collapseBy(df, idCol, col(keyCol))

  private def collapseBy(df: DataFrame, idCol: String, key: Column): Collapsed = {
    // one shuffle keyed by the sorted set: window aggregates attach
    // gid/m to every member in place (no membership join-back, no
    // self-join ambiguity); the group rows are the members whose id IS
    // the group minimum. partitionBy(key) is a keyed window — null
    // keys form one group like any other partition value.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
    val members = df
      .select(key.as("key"), col(idCol).as("id"))
      .select(min(col("id")).over(w).as("gid"), col("id"),
        count(lit(1)).over(w).as("m"),
        coalesce(size(col("key")), lit(-1)).as("n"), col("key"))
    val groups = members.filter(col("id") === col("gid"))
      .select(col("gid"), col("key"), col("m"), col("n"))
    Collapsed(groups, members.select(col("gid"), col("id"), col("m"), col("n")))
  }

  /** All within-group member pairs: (`da` < `db`, `gid`), one row per
    * unordered pair of a group with ≥ 2 members whose set size clears
    * `minN`. Pair stats are group constants — callers join them in
    * from [[Collapsed.groups]] on `gid` (or filter on the carried
    * `n`). Bounded expansion via [[KeyedPairs]]: a mega-clique splits
    * into block-pair tasks.
    *
    * `minN` filters BEFORE the pair stage: the n = 0 clique (every
    * doc whose text yields no shingles collapses into ONE group) and
    * the null-set clique (n = -1) can be the largest groups in a real
    * crawl, and the raw pipelines never paired them (explode of an
    * empty array emits nothing) — expanding their quadratic pair set
    * only for the caller's post-filter to drop every row would
    * reintroduce the exact waste this operator removes. Callers whose
    * emit threshold is a set-size bound pass it here (winnow's
    * shared >= 3 ⇒ minN = 3).
    */
  def withinPairs(members: DataFrame, cap: Int, minN: Int = 1): DataFrame =
    // members carry the group size `m` on every row, so the bucket
    // size is pre-known: the presized route skips even the in-plan
    // window count the generic path pays — one map-side filter routes
    // each group (round 18; output contract identical,
    // DupCollapseSpec unchanged)
    KeyedPairs.pairsPresized(members.filter(col("m") >= 2 && col("n") >= minN),
        Seq("gid"), col("m"), struct(col("id"), col("gid"), col("n")), cap)
      .select(col("pa.id").as("da"), col("pb.id").as("db"),
        col("pa.gid").as("gid"), col("pa.n").as("n"))

  /** Expand representative-level pair rows (`ga`, `gb`, stats...) to
    * member-level (`da` < `db`, stats...): the full cross product of
    * the two groups' members. `swap` lists (aStat, bStat) column-name
    * pairs that are tied to the a/b sides (e.g. per-doc set sizes)
    * and must swap whenever the member ids swap to restore `da < db`.
    */
  def expandPairs(repPairs: DataFrame, members: DataFrame,
      swap: Seq[(String, String)] = Nil): DataFrame = {
    val ma = members.select(col("gid").as("ga"), col("id").as("__ia"))
    val mb = members.select(col("gid").as("gb"), col("id").as("__ib"))
    val joined = repPairs.join(ma, "ga").join(mb, "gb")
    val fwd = col("__ia") <= col("__ib")
    val swapped = swap.foldLeft(
        joined.withColumn("da", least(col("__ia"), col("__ib")))
          .withColumn("db", greatest(col("__ia"), col("__ib")))) {
      case (acc, (a, b)) =>
        acc.withColumn(s"__sw_$a", when(fwd, col(a)).otherwise(col(b)))
          .withColumn(s"__sw_$b", when(fwd, col(b)).otherwise(col(a)))
          .drop(a, b)
          .withColumnRenamed(s"__sw_$a", a).withColumnRenamed(s"__sw_$b", b)
    }
    val stats = repPairs.columns.filter(c => c != "ga" && c != "gb")
    swapped.select((Seq("da", "db") ++ stats).map(col): _*)
  }
}
