package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ExtraQueriesSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("Tables.events leaks no nanosAsLong conf into the session") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    val ev = Tables.events(spark, sf)
    assert(spark.conf.getOption(key) == before,
      "events() left the legacy nanos conf set session-wide")
    // the scan still works at ACTION time without the conf (explicit
    // schema carries the nanos-as-long mapping)
    assert(ev.count() > 0)
    assert(ev.schema("ts").dataType.typeName == "timestamp_ntz")
    assert(ev.schema("ts_ns").dataType.typeName == "long")
  }

  test("q40 checked gate: exact counts match and the epsilon bound holds") {
    val rows = ExtraQueries.all("q40_approx_distinct")(spark, sf).collect()
    val exact = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus")).agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty && rows.length == exact.size)
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)), "exact_cust column diverged")
      assert(r.getBoolean(2), s"within_eps gate failed for status ${r.getString(0)}")
    }
  }

  test("MinHashUnion aggregator: signature union == signature of union") {
    import spark.implicits._
    // signatures of three "documents" (random but fixed)
    val rng = new scala.util.Random(7)
    val sigs = Seq.fill(3)(Seq.fill(MinHashUnion.NumHashes)(rng.nextLong()))
    val ds = sigs.zipWithIndex.map { case (s, i) => (i % 2, s) }
      .toDF("grp", "sig").as[(Int, Seq[Long])]
    val merged = ds.groupByKey(_._1).mapValues(_._2)
      .agg(MinHashUnion.toColumn.name("u"))
      .collect().toMap
    // group 0 holds sigs 0 and 2; group 1 holds sig 1
    val expect0 = sigs(0).zip(sigs(2)).map { case (a, b) => math.min(a, b) }
    assert(merged(0) == expect0)
    assert(merged(1) == sigs(1))
    // estimate of identical signatures is 1.0
    assert(MinHashUnion.estimate(sigs(0), sigs(0)) == 1.0)
  }
}
