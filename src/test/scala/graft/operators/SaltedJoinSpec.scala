package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SaltedJoinSpec extends SparkTestBase {
  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val large = spark.range(10000)
      .select(col("id"),
        when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id") % 100).as("k"))
    val small = Seq((1L, "hot"), (10L, "ten"), (20L, "twenty"), (99L, "none"))
      .toDF("k", "label")
    val plain = large.join(small, "k").groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SaltedJoin(large, small, "k", col("id"), salts = 8)
      .groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain && plain("hot") == 9000L)
    // salt actually spreads the hot key across buckets
    val buckets = large
      .withColumn("__salt", pmod(xxhash64(col("id")), lit(8)).cast("int"))
      .filter(col("k") === 1).select("__salt").distinct().count()
    assert(buckets == 8)
  }
}
