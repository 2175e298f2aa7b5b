package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  test("attaches nearest-preceding left value per key; null when none") {
    import spark.implicits._
    val sensors = Seq(
      (1L, 10L, "a10"), (1L, 20L, "a20"), (2L, 15L, "b15")
    ).toDF("dev", "ts", "reading")
    val queries = Seq(
      (1L, 5L), (1L, 10L), (1L, 25L), (2L, 14L), (2L, 99L)
    ).toDF("dev", "qts")
    val out = AsOfJoin(sensors, queries, "dev", "ts", "qts", Seq("reading"))
      .orderBy("dev", "qts").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)).orNull))
    assert(out.toSeq == Seq(
      (1L, 5L, null),      // nothing at-or-before 5
      (1L, 10L, "a10"),    // exact-time match included
      (1L, 25L, "a20"),
      (2L, 14L, null),
      (2L, 99L, "b15")))
  }

  test("matches q22's inline technique on testdata") {
    val sf = "/root/testdata/sf0.001"
    val e = graft.queries.Tables.events(spark, sf)
      .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("event_id"))
    val o = graft.queries.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey").as("user_id"),
        col("o_orderdate"))
    val viaOperator = AsOfJoin(e, o, "user_id", "ts", "o_orderdate", Seq("event_id"))
      .select(col("o_orderkey"), col("event_id").as("matched_event_id"))
      .orderBy("o_orderkey").collect().map(r => (r.getLong(0), r.get(1)))
    val viaQuery = graft.SparkEntry.queries("q22_asof_join")(spark, sf)
      .select(col("o_orderkey"), col("matched_event_id"))
      .orderBy("o_orderkey").collect().map(r => (r.getLong(0), r.get(1)))
    assert(viaOperator.toSeq == viaQuery.toSeq)
  }

  test("mixed ts types widen (never truncate the finer side); lossy mixes fail loudly") {
    import spark.implicits._
    // left is DATE, right is TIMESTAMP: the 12:00 event must see the
    // same-day left row, and a 00:00 next-day left row must NOT match
    val sensors = Seq(("2024-03-01", "d1"), ("2024-03-02", "d2")).toDF("k_", "v")
      .select(lit(1L).as("dev"), col("k_").cast("date").as("ts"), col("v"))
    val queries = Seq("2024-03-01 12:00:00").toDF("q_")
      .select(lit(1L).as("dev"), col("q_").cast("timestamp_ntz").as("qts"))
    val out = AsOfJoin(sensors, queries, "dev", "ts", "qts", Seq("v")).head()
    assert(out.getAs[String]("v") == "d1")
    // int vs long widens to long without overflow surprises
    val li = Seq((1L, 5, "a")).toDF("dev", "ts", "v")
    val rl = Seq((1L, 4294967301L)).toDF("dev", "qts")   // > Int.MaxValue
    val wide = AsOfJoin(li, rl, "dev", "ts", "qts", Seq("v")).head()
    assert(wide.getAs[String]("v") == "a")               // 5 <= 4294967301
    // double vs timestamp: no sane widening — must throw, not coerce
    val bad = Seq((1L, 1.5)).toDF("dev", "ts")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin(bad.withColumn("v", lit("x")), queries, "dev", "ts", "qts", Seq("v"))
    }
    assert(e.getMessage.contains("widen"))
  }

  test("genuinely-null left values carry as null, not skipped (regression)") {
    import spark.implicits._
    val sensors = Seq(
      (1L, 10L, Some("a10"), Some(1.0)),
      (1L, 20L, None: Option[String], Some(2.0))   // v null at ts=20
    ).toDF("dev", "ts", "v", "x")
    val queries = Seq((1L, 25L)).toDF("dev", "qts")
    val out = AsOfJoin(sensors, queries, "dev", "ts", "qts", Seq("v", "x")).head()
    // latest preceding left row is ts=20: v must be null (not stale a10),
    // x must be 2.0 from the SAME row (no cross-row mixing)
    assert(out.isNullAt(out.fieldIndex("v")))
    assert(out.getDouble(out.fieldIndex("x")) == 2.0)
  }
}
