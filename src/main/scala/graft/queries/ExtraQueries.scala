package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Additional operator coverage for SURVEY.md §2.2's category sweep:
  * ranking/offset/ntile window functions, GROUPING SETS, statistical
  * aggregates (computed from decimal-exact moments so both engines get
  * bit-identical doubles), map functions over parsed JSON, and
  * approximate distinct counting (no oracle — HLL implementations
  * differ; bounded-error-checked in ExtraQueriesSpec).
  */
object ExtraQueries {
  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(
    // Q36 — ranking + offset windows over orders per customer.
    "q36_rank_windows" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"))
        .orderBy(col("o_custkey"), col("rnk"), col("o_orderkey"))
    }),

    // Q37 — GROUPING SETS (the general form of Q05's rollup / Q21's cube).
    "q37_grouping_sets" -> ((s, d) =>
      customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupingSets(
          Seq(Seq(col("n_name"), col("c_mktsegment")), Seq(col("n_name")), Seq()),
          col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("n_name"), asc_nulls_first("c_mktsegment"))),

    // Q38 — statistical aggregates from decimal-exact moments: both
    // engines compute sum/sumsq exactly, then the same double formula —
    // no accumulation-order drift (stddev_samp/var_samp built-ins would
    // drift between engines).
    "q38_stats_agg" -> ((s, d) => {
      val x = col("l_extendedprice").cast("decimal(28,10)")
      lineitem(s, d).groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("s1"),
        sum(x * x).cast("double").as("s2"))
        .select(
          col("l_returnflag"), col("n"),
          rk(col("s1") / col("n"), 4).as("mean"),
          rk((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1), 4).as("variance"),
          rk(sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)), 4).as("stddev"))
        .orderBy(col("l_returnflag"))
    }),

    // Q39 — map functions over parsed JSON: events.props → map, key
    // access + cardinality (the connection-header map model, reference
    // FlattenedRosWriter.cpp:218-220).
    "q39_map_funcs" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.MapType(org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)).as("m"))
        .select(col("event_id"),
          element_at(col("m"), "k").cast("long").as("k_val"),
          size(map_keys(col("m"))).cast("long").as("n_keys"))
        .orderBy(col("event_id"))),

    // Q40 — approx_count_distinct (HLL++): no oracle (engine-specific
    // sketches); ExtraQueriesSpec bounds the error against exact.
    "q40_approx_distinct" -> ((s, d) =>
      orders(s, d).groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_cust"))
        .orderBy(col("o_orderstatus"))),

    // Q41 — full outer join (completes the join family; both-null sides
    // forced by disjoint-ish customer subsets).
    "q41_full_outer" -> ((s, d) => {
      val c = customer(s, d)
      val a = c.filter(col("c_acctbal") > 9000).select(col("c_custkey").as("ka"))
      val b = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("kb"))
      a.join(b, col("ka") === col("kb"), "full_outer")
        .select(coalesce(col("ka"), col("kb")).as("k"),
          col("ka").isNotNull.as("is_rich"),
          col("kb").isNotNull.as("is_building"))
        .orderBy(col("k"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q36_rank_windows" ->
      """SELECT o_orderkey, o_custkey,
        |       CAST(RANK() OVER w AS INT) AS rnk,
        |       CAST(DENSE_RANK() OVER w AS INT) AS drnk,
        |       CAST(NTILE(4) OVER w AS INT) AS quartile,
        |       LEAD(o_orderkey, 1) OVER w AS next_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rnk, o_orderkey""".stripMargin,
    "q37_grouping_sets" ->
      """SELECT n_name, c_mktsegment, COUNT(*) AS cnt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
    "q38_stats_agg" ->
      """WITH g AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS s1,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))
        |                * CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS s2
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |       FLOOR(s1 / n * 10000.0 + 0.5) / 10000.0 AS mean,
        |       FLOOR((s2 - s1 * s1 / n) / (n - 1) * 10000.0 + 0.5) / 10000.0 AS variance,
        |       FLOOR(sqrt((s2 - s1 * s1 / n) / (n - 1)) * 10000.0 + 0.5) / 10000.0 AS stddev
        |FROM g ORDER BY l_returnflag""".stripMargin,
    "q39_map_funcs" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |       CAST(len(json_keys(props)) AS BIGINT) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,
    "q41_full_outer" ->
      """SELECT COALESCE(a.ka, b.kb) AS k,
        |       a.ka IS NOT NULL AS is_rich, b.kb IS NOT NULL AS is_building
        |FROM (SELECT c_custkey AS ka FROM customer WHERE c_acctbal > 9000) a
        |FULL OUTER JOIN (SELECT c_custkey AS kb FROM customer
        |                 WHERE c_mktsegment = 'BUILDING') b ON a.ka = b.kb
        |ORDER BY k""".stripMargin
    // q40: no oracle (sketch-based)
  )
}
