package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** PrefixSum's two-phase distributed scan must equal the serial
  * single-partition window cumsum for any total order — the scale
  * rewrite must be invisible to results.
  */
class PrefixSumSpec extends SparkTestBase {
  import spark.implicits._

  private def oracle(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("expect",
      coalesce(sum(coalesce(col("v"), lit(0L)))
        .over(Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))

  test("equals the window cumsum on random data across many partitions") {
    val rng = new scala.util.Random(41)
    val rows = (0 until 5000).map(i => (i.toLong, rng.nextInt(100).toLong))
    val df = rows.toDF("id", "v").repartition(16)
    val got = PrefixSum.exclusive(df, Seq(col("id")), col("v"), "prefix")
    val joined = got.join(oracle(df).select(col("id"), col("expect")), "id")
    assert(joined.filter(col("prefix") =!= col("expect")).count() == 0)
    assert(got.count() == 5000)
    assert(got.columns.toSeq == Seq("id", "v", "prefix"))
  }

  test("null values count as zero; order survives skewed input layout") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, null), (2L, 10L), (3L, null), (4L, 5L), (5L, 1L))
      .toDF("id", "v").repartition(8)
    val got = PrefixSum.exclusive(df, Seq(col("id")), col("v"), "prefix")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 10L), (4L, 10L), (5L, 15L)))
  }

  test("empty input yields empty output with the prefix column") {
    val df = Seq.empty[(Long, Long)].toDF("id", "v")
    val got = PrefixSum.exclusive(df, Seq(col("id")), col("v"))
    assert(got.count() == 0)
    assert(got.columns.contains("prefix"))
  }

  test("reserved and colliding column names are rejected") {
    val df = Seq((1L, 2L)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      PrefixSum.exclusive(df.withColumn("__ps_v", lit(1L)), Seq(col("id")), col("v"))
    }
    intercept[IllegalArgumentException] {
      PrefixSum.exclusive(df, Seq(col("id")), col("v"), out = "v")
    }
  }
}
