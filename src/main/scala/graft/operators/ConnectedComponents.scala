package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative hash-min label propagation — the
  * missing last step of near-duplicate DEDUP: pair emitters (n-gram
  * Jaccard, MinHash-LSH, SimHash) produce edges, but "keep one copy
  * per duplicate CLUSTER" needs the transitive closure (A~B, B~C puts
  * A and C in one cluster even when the pair stage never compared
  * them).
  *
  * Each round every node takes the min component label among itself
  * and its neighbors; a label therefore travels one hop per round and
  * the loop converges in `diameter(G)` rounds. Near-dup clusters are
  * shallow (copies of a common ancestor — diameter a few hops), which
  * makes this the right algorithm here; for general graphs with long
  * chains, the large-star/small-star variant (O(log n) rounds) is the
  * scale path and slots behind the same interface.
  *
  * Scale shape per round: one shuffle for the neighbor-min aggregation
  * keyed by node, one broadcast-or-shuffle join to merge labels, one
  * count action for the convergence check. The edge list is persisted
  * once and reused every round. Each generation of labels is
  * localCheckpoint'ed: an iterative plan that references the previous
  * generation several times grows EXPONENTIALLY without lineage
  * truncation (the planner itself OOMs stringifying it around round
  * 15). On a production cluster prefer reliable `checkpoint()` with a
  * checkpoint dir — localCheckpoint trades executor-loss recovery for
  * not needing one.
  */
object ConnectedComponents {

  /** @param edges undirected edges, two columns
    * @return (id, comp) for every node appearing in `edges`, where
    *         comp = min node id of the component — deterministic.
    */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
                 maxIter: Int = 20): DataFrame = {
    val sym = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist()
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var i = 0
    var done = false
    while (!done && i < maxIter) {
      val next = labels
        .join(
          sym.join(labels.select(col("id").as("b"), col("comp")), "b")
            .groupBy(col("a").as("id"))
            .agg(min(col("comp")).as("nmin")),
          Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
        .localCheckpoint(true)   // truncate lineage — see scaladoc
      val changed = next
        .join(labels.select(col("id"), col("comp").as("prev")), "id")
        .filter(col("comp") =!= col("prev")).count()
      done = changed == 0
      labels.unpersist()
      labels = next
      i += 1
    }
    sym.unpersist()
    require(done, s"connected components did not converge in $maxIter rounds " +
      "(graph diameter exceeds maxIter — raise it, or use a star-contraction variant)")
    labels
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SOCC'14 — public algorithm): converges in O(log n)
    * rounds on ANY graph shape, vs `components`' diameter-many rounds.
    * This is the scale path when cluster graphs stop being shallow —
    * chain-shaped duplicate graphs (doc A ~ A' ~ A'' ~ ...) give label
    * propagation a round per hop, while star contraction halves
    * depth every round.
    *
    * Per round: large-star hangs every strictly-larger neighbor of u
    * onto u's minimum (one groupBy + one co-partitioned join — the
    * neighbor lists are never collected into a buffer), small-star
    * does the same for the smaller neighbors. Both preserve
    * connectivity (paper, Lemmas 1-2); a stable state is a depth-1
    * star per component rooted at the component min. Convergence test:
    * cheap (count, xxhash-sum) fingerprint per round, confirmed with
    * an exact except() only when the fingerprint matches — never a
    * probabilistic stop.
    *
    * Same output contract as `components`: (id, comp = min node id),
    * for every node with degree >= 1 after null/self-loop removal.
    */
  def componentsStar(edges: DataFrame, srcCol: String, dstCol: String,
                     maxIter: Int = 30): DataFrame = {
    var cur = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("a"),
              least(col("a"), col("b")).as("b"))     // orient a > b
      .distinct()
      .localCheckpoint(true)                         // truncate lineage per round
    def fingerprint(df: DataFrame): (Long, Long) = {
      // bit_xor, not sum: xor of hashes can't overflow under ANSI and
      // is order-insensitive; it is only a cheap pre-check — equality
      // is always confirmed exactly below
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var curFp = fingerprint(cur)
    var i = 0
    var done = false
    while (!done && i < maxIter) {
      // large-star: symmetric view; every neighbor b > a links to a's min
      val sym = cur.union(cur.select(col("b").as("a"), col("a").as("b")))
      val mins = sym.groupBy(col("a")).agg(min(col("b")).as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      val large = sym.join(mins, "a").where(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))  // b_old > a >= m: stays oriented
        .distinct()
        .localCheckpoint(true)
      // small-star on the oriented edges: low neighbors and self to the min
      val minsS = large.groupBy(col("a")).agg(min(col("b")).as("m"))
      val next = large.join(minsS, "a").where(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b"))
        .union(minsS.select(col("a"), col("m").as("b")))
        .distinct()
        .localCheckpoint(true)
      val nextFp = fingerprint(next)
      // fingerprint equality is necessary; confirm exactly (except is
      // empty both ways iff the sets are equal given equal counts)
      done = nextFp == curFp && next.exceptAll(cur).isEmpty
      cur = next
      curFp = nextFp
      i += 1
    }
    require(done, s"star contraction did not converge in $maxIter rounds")
    // stable state is (child, root) stars; roots label themselves
    cur.select(col("a").as("id"), col("b").as("comp"))
      .union(cur.select(col("b").as("id"), col("b").as("comp")))
      .groupBy(col("id")).agg(min(col("comp")).as("comp"))
  }

  /** Size-routed variant: a near-dup pair graph is usually TINY
    * relative to the corpus (it only holds docs that survived the
    * similarity threshold), and a tiny graph shouldn't pay
    * diameter-many Spark rounds — below `driverThreshold` edges the
    * graph is collected and solved with union-find on the driver
    * (model-sized data, same reasoning as IvfIndex's driver-side
    * centroids); above it, the distributed rounds run. Both paths
    * produce the identical (id, comp=min id) labeling.
    */
  def componentsAuto(edges: DataFrame, srcCol: String, dstCol: String,
                     driverThreshold: Long = 1000000L,
                     maxIter: Int = 20,
                     starMaxIter: Int = 30): DataFrame = {
    // the driver path works on Long ids; a lossy cast("long") on e.g.
    // string/double ids would null them silently, so non-integral id
    // types take the distributed path (which orders any comparable type)
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    val idTypes = edges.select(col(srcCol), col(dstCol)).schema.map(_.dataType)
    // routed paths get componentsStar's own budget (starMaxIter), not
    // the propagation maxIter: 20 rounds is tuned for label hops, but
    // the O(log n) contraction on a billion-node graph can need more —
    // forwarding the smaller bound would abort a job that was converging
    if (!idTypes.forall(integral.contains))
      return componentsStar(edges, srcCol, dstCol, starMaxIter)
    // drop null-id edges up front: the distributed paths drop them too
    // (null =!= x is null → filtered), and Row.getLong would NPE below
    val pairs = edges.select(col(srcCol).cast("long"), col(dstCol).cast("long"))
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
    // above the driver threshold the graph is genuinely large, where
    // depth is unknowable — take the O(log n)-round star contraction,
    // not the diameter-bounded propagation. One bounded job decides
    // AND fetches: CollectLimit of threshold+1 rows — if the limit
    // fills, the graph is over budget (a separate count() would run
    // the edge derivation twice). The limit clamps at Int.MaxValue, so
    // a threshold at or past the clamp would make the over-budget
    // check below unable to distinguish a truncated fetch from the
    // complete edge set — refuse it up front (collecting ~2^31 rows
    // would OOM the driver long before this mattered anyway)
    require(driverThreshold < Int.MaxValue - 1L,
      s"driverThreshold=$driverThreshold exceeds the CollectLimit clamp " +
        s"(${Int.MaxValue - 2}); the over-budget guard could not tell " +
        "truncation from completeness — use the distributed path instead")
    val es = pairs.limit(math.toIntExact(driverThreshold) + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (es.length > driverThreshold)
      return componentsStar(edges, srcCol, dstCol, starMaxIter)
    val parent = scala.collection.mutable.Map[Long, Long]()
    // iterative find with path halving — a recursive find stack-overflows
    // on the O(n)-deep chains an adversarial union order can build
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElseUpdate(x, x)
      while (p != x) {
        val gp = parent.getOrElseUpdate(p, p)
        parent(x) = gp
        x = gp
        p = parent.getOrElseUpdate(x, x)
      }
      x
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val spark = edges.sparkSession
    import spark.implicits._
    parent.keys.toSeq.map(k => (k, find(k))).toDF("id", "comp")
  }
}
