package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  /** brute force union-find */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, cliques, and singleton edges match union-find") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),          // chain: all -> 1
      (10L, 11L), (11L, 12L), (10L, 12L),    // triangle: all -> 10
      (20L, 21L),                            // pair
      (31L, 30L))                            // reversed order edge
    assert(run(edges) == brute(edges))
  }

  test("random graphs match union-find (seeded), both routing paths agree") {
    for (seed <- 1 to 5) {
      val rng = new scala.util.Random(seed)
      val n = 40
      val edges = Seq.fill(30)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expected = brute(edges)
      assert(run(edges) == expected, s"seed=$seed edges=$edges")
      // componentsAuto: driver path (threshold above size) and
      // distributed path (threshold 0) must both match
      for (thresh <- Seq(0L, 1000000L)) {
        val auto = ConnectedComponents
          .componentsAuto(edges.toDF("src", "dst"), "src", "dst", thresh)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(auto == expected, s"seed=$seed thresh=$thresh")
      }
    }
  }

  test("long path converges (diameter rounds) and self-loops are ignored") {
    val path = (0L until 15L).map(i => (i, i + 1)) :+ (7L, 7L)
    val got = run(path)
    assert(got.values.toSet == Set(0L))
    assert(got.keys.toSet == (0L to 15L).toSet)
  }

  test("driver path survives an adversarial 30k-deep union chain") {
    // edges (i, i+1) applied in DECREASING i order build a parent chain
    // of depth n on the driver union-find; a recursive find() would
    // StackOverflowError in the final labeling pass — the iterative
    // path-halving find must not
    val n = 30000L
    val edges = (n - 1 to 0L by -1).map(i => (i, i + 1))
    val got = ConnectedComponents
      .componentsAuto(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n.toInt + 1 && got.values.toSet == Set(0L))
  }

  test("star contraction matches union-find on random graphs and hard shapes") {
    def runStar(edges: Seq[(Long, Long)], maxIter: Int = 30): Map[Long, Long] =
      ConnectedComponents.componentsStar(edges.toDF("src", "dst"), "src", "dst", maxIter)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (seed <- 1 to 5) {
      val rng = new scala.util.Random(100 + seed)
      val n = 50
      val edges = Seq.fill(40)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(runStar(edges) == brute(edges), s"seed=$seed")
    }
    // shapes that stress the contraction invariants
    val chain = (0L until 20L).map(i => (i, i + 1))
    val clique = for (a <- 0L until 8L; b <- (a + 1) until 8L) yield (a, b)
    val star = (1L to 10L).map(i => (0L, i))
    val twoComps = chain ++ star.map { case (a, b) => (a + 100, b + 100) }
    for (g <- Seq(chain, clique, star, twoComps))
      assert(runStar(g) == brute(g))
  }

  test("star contraction converges in O(log n) rounds on a deep path") {
    // a 2000-node path has diameter 2000: label propagation would need
    // 2000 rounds; star contraction must finish well under 20
    val path = (0L until 2000L).map(i => (i, i + 1))
    val got = ConnectedComponents
      .componentsStar(path.toDF("src", "dst"), "src", "dst", maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 2001 && got.values.toSet == Set(0L))
  }

  test("star contraction handles non-integral ids (distributed auto path)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y"))
    val got = ConnectedComponents
      .componentsStar(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("null-id edges are dropped identically on both routing paths") {
    // the distributed path drops null-id edges via a =!= b null
    // semantics; the driver path must filter them too, not NPE in
    // Row.getLong
    val edges = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (2L, 3L), (null, 5L), (6L, null), (null, null), (8L, 9L))
      .toDF("src", "dst")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 8L, 9L -> 8L)
    for (thresh <- Seq(0L, 1000000L)) {
      val got = ConnectedComponents.componentsAuto(edges, "src", "dst", thresh)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"thresh=$thresh")
    }
  }

  test("driverThreshold at or past the CollectLimit clamp is refused up front") {
    // past the clamp the over-budget guard could mistake a truncated
    // fetch for the complete edge set — it must throw, not proceed
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    for (thresh <- Seq(Int.MaxValue - 1L, Int.MaxValue.toLong, Long.MaxValue)) {
      val ex = intercept[IllegalArgumentException] {
        ConnectedComponents.componentsAuto(edges, "src", "dst", thresh)
      }
      assert(ex.getMessage.contains("CollectLimit clamp"), ex.getMessage)
    }
    // the largest accepted threshold still works
    val got = ConnectedComponents
      .componentsAuto(edges, "src", "dst", Int.MaxValue - 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("non-integral id types route to the distributed path, not a lossy cast") {
    // string ids would cast("long") to null on the driver path; the
    // type guard must send them through the distributed rounds instead
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y"))
    val got = ConnectedComponents
      .componentsAuto(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }
}
