package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftplans.AsOfJoinExec
import graft.SparkTestBase

/** The custom-operator (LogicalPlan + Strategy + BinaryExecNode) as-of
  * join: semantics vs the union+window encoding, plan shape, and the
  * null-handling corners where the two encodings legitimately differ.
  */
class AsOfJoinExecSpec extends SparkTestBase
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  import spark.implicits._

  /** Materialize, then return the final physical plan (AQE re-plans
    * during execution; nodes live inside query stages, which are leaves
    * for plain TreeNode traversal — use the adaptive helper's collect).
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame) = {
    df.collect()
    df.queryExecution.executedPlan
  }

  private def findExec(df: org.apache.spark.sql.DataFrame): Seq[AsOfJoinExec] =
    collect(finalPlan(df)) { case e: AsOfJoinExec => e }

  test("basic semantics: nearest-preceding value per key, null when none") {
    val sensors = Seq(
      (1L, 10L, "a10"), (1L, 20L, "a20"), (2L, 15L, "b15")
    ).toDF("dev", "ts", "reading")
    val queries = Seq(
      (1L, 5L), (1L, 10L), (1L, 25L), (2L, 14L), (2L, 99L), (3L, 1L)
    ).toDF("dev", "qts")
    val df = AsOfJoin.native(sensors, queries, "dev", "ts", "qts", Seq("reading"))
    assert(findExec(df).nonEmpty, "plan does not contain AsOfJoinExec")
    val out = df.orderBy("dev", "qts").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)).orNull))
    assert(out.toSeq == Seq(
      (1L, 5L, null), (1L, 10L, "a10"), (1L, 25L, "a20"),
      (2L, 14L, null), (2L, 99L, "b15"), (3L, 1L, null)))
  }

  test("matches the union+window operator on seeded random streams") {
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      // unique (key, ts) per left row — ties are arbitrary in BOTH forms
      val left = rng.shuffle((0 until 400).map { i =>
        (rng.nextInt(8).toLong, i.toLong * 3 + rng.nextInt(3), s"v$i", i.toDouble)
      }.distinct.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq)
        .toDF("k", "ts", "s", "x")
      val right = rng.shuffle((0 until 300).map { i =>
        (rng.nextInt(10).toLong, rng.nextInt(1300).toLong, i.toLong)
      }).toDF("k", "ts", "rid")
      val a = AsOfJoin(left, right, "k", "ts", "ts", Seq("s", "x"))
        .orderBy("rid").collect().map(r => r.toSeq).toSeq
      val b = AsOfJoin.native(left, right, "k", "ts", "ts", Seq("s", "x"))
        .orderBy("rid").collect().map(r => r.toSeq).toSeq
      assert(a == b, s"seed=$seed")
    }
  }

  test("plan shape: co-partitioning exchanges + per-partition sorts, no window") {
    val left = (0 until 100).map(i => (i.toLong % 7, i.toLong, i * 1.0))
      .toDF("k", "ts", "x")
    val right = (0 until 100).map(i => (i.toLong % 9, i.toLong))
      .toDF("k", "ts")
    val df = AsOfJoin.native(left, right, "k", "ts", "ts", Seq("x"))
    val plan = finalPlan(df)
    val s = plan.toString
    assert(collect(plan) { case e: AsOfJoinExec => e }.size == 1)
    assert(!s.contains("Window"), "custom exec must not plan a window")
    // both children sorted by (key, ts) under the exec
    val sorts = collect(plan) { case e: org.apache.spark.sql.execution.SortExec => e }
    assert(sorts.size >= 2, s"expected per-side sorts, got:\n$s")
  }

  test("null corners: null left ts ignored, null right key yields nulls") {
    val left = Seq(
      (Some(1L), Some(10L), "ok"),
      (Some(1L), None: Option[Long], "null-ts"), // never matches
      (None: Option[Long], Some(5L), "null-key") // never matches
    ).toDF("k", "ts", "v")
    val right = Seq(
      (Some(1L), Some(20L)),
      (None: Option[Long], Some(20L)),           // null key -> no match
      (Some(1L), None: Option[Long])             // null ts -> no match
    ).toDF("k", "ts")
    val out = AsOfJoin.native(left, right, "k", "ts", "ts", Seq("v"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2))))
    assert(out.count(_._3.contains("ok")) == 1)
    assert(out.count(_._3.isEmpty) == 2)
    assert(!out.exists(_._3.exists(v => v == "null-ts" || v == "null-key")))
  }

  test("mismatched-but-joinable KEY types widen — int vs long keys still match") {
    // regression: without a common key type, hash(5:Int) != hash(5L)
    // puts equal keys in different partitions -> silent null matches
    val left = Seq((1, 10L, "a"), (2, 5L, "b")).toDF("k", "ts", "v") // k: Int
    val right = Seq((1L, 20L), (2L, 20L), (3L, 20L)).toDF("k", "ts") // k: Long
    val out = AsOfJoin.native(left, right, "k", "ts", "ts", Seq("v"))
      .orderBy("k").collect().map(r => Option(r.getString(2)).orNull)
    assert(out.toSeq == Seq("a", "b", null))
    // and a lossy key mix still fails loudly
    val bad = Seq(("x", 1L, "v")).toDF("k", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.native(bad, right.select(col("k").cast("double").as("k"), col("ts")),
        "k", "ts", "ts", Seq("v"))
    }
    assert(e.getMessage.contains("widen"))
  }

  test("reserved working names are rejected on valueCols, not silently dropped") {
    // a left valueCol named like a hidden working column would be
    // removed by the final drop(hidden) — must fail loudly instead
    val left = Seq((1, 10L, "a")).toDF("k", "ts", "__asof_rk") // k: Int
    val right = Seq((1L, 5L)).toDF("k", "ts")                  // k: Long -> needs cast
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.native(left, right, "k", "ts", "ts", Seq("__asof_rk"))
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("ensureStrategy is idempotent when the extension already injected it") {
    // GraftExtensions wires AsOfJoinStrategy via injectPlannerStrategy;
    // repeated asof() calls must not accumulate duplicates in
    // experimental.extraStrategies
    val left = Seq((1L, 10L, "a")).toDF("k", "ts", "v")
    val right = Seq((1L, 20L)).toDF("k", "ts")
    val before = spark.experimental.extraStrategies.count(_ ==
      org.apache.spark.sql.graftplans.AsOfJoinStrategy)
    AsOfJoin.native(left, right, "k", "ts", "ts", Seq("v")).collect()
    AsOfJoin.native(left, right, "k", "ts", "ts", Seq("v")).collect()
    val after = spark.experimental.extraStrategies.count(_ ==
      org.apache.spark.sql.graftplans.AsOfJoinStrategy)
    assert(after == before,
      s"extraStrategies grew $before -> $after despite the extension wiring")
  }

  test("downstream same-key aggregation reuses the exec's partitioning (no 3rd exchange)") {
    val left = (0 until 100).map(i => (i.toLong % 7, i.toLong, i * 1.0))
      .toDF("k", "ts", "x")
    val right = (0 until 100).map(i => (i.toLong % 9, i.toLong)).toDF("k", "ts")
    val agg = AsOfJoin.native(left, right, "k", "ts", "ts", Seq("x"))
      .groupBy(col("k")).agg(sum(col("x")).as("sx"))
    agg.collect()
    val shuffles = collect(agg.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(shuffles.size == 2,
      s"expected only the two as-of input shuffles; groupBy(k) must reuse the " +
        s"exec's output partitioning, got ${shuffles.size}:\n${agg.queryExecution.executedPlan}")
  }

  test("exec declares right-side (key, ts) output ordering and clustering") {
    val left = (0 until 50).map(i => (i.toLong % 5, i.toLong, i)).toDF("k", "ts", "x")
    val right = (0 until 50).map(i => (i.toLong % 5, (i * 7 % 50).toLong)).toDF("k", "ts")
    val df = AsOfJoin.native(left, right, "k", "ts", "ts", Seq("x"))
    df.collect()
    val exec = findExec(df).head
    // downstream per-partition-order consumers (merge joins, windows on
    // the same key) can skip their sort: the ordering is declared
    val ord = exec.outputOrdering.map(_.child)
    assert(ord == Seq(exec.rightKey, exec.rightTs))
    // rows actually arrive in that order within each partition
    val ok = df.select(col("k"), col("ts")).rdd
      .mapPartitions { it =>
        val rows = it.map(r => (r.getLong(0), r.getLong(1))).toSeq
        Iterator.single(rows == rows.sorted)
      }.collect()
    assert(ok.forall(identity))
  }
}
