package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.queries.Tables

/** The 100 TB claim behind BucketedLayout is a PLAN property: joins and
  * aggregations on the bucket key must plan without any Exchange.
  */
class BucketedLayoutSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def withConf[T](k: String, v: String)(body: => T): T = {
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body finally prev.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  test("same-key same-count bucketed tables join and aggregate with zero Exchange") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("source"), col("n_chars"))
    val meta = docs.select(col("doc_id"), (col("n_chars") % 7).as("shard"))
    BucketedLayout.write(docs, "b_docs", "doc_id", 4)
    BucketedLayout.write(meta, "b_meta", "doc_id", 4)

    // forbid broadcast so the exchange-free claim is about BUCKETING,
    // not about the test table being tiny
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val j = BucketedLayout.read(spark, "b_docs")
        .join(BucketedLayout.read(spark, "b_meta"), "doc_id")
      val jp = j.queryExecution.executedPlan.toString
      assert(!jp.contains("Exchange"), s"bucketed join still shuffles:\n$jp")
      assert(j.count() == docs.count())

      val agg = BucketedLayout.read(spark, "b_docs")
        .groupBy(col("doc_id")).agg(sum(col("n_chars")))
      val ap = agg.queryExecution.executedPlan.toString
      assert(!ap.contains("Exchange"), s"bucketed agg still shuffles:\n$ap")
      assert(agg.count() == docs.count())
    }

    // the same join WITHOUT the bucketed layout does shuffle — the
    // layout, not the data size, is what removed the Exchange
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val plain = docs.join(meta, "doc_id")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    }

    spark.sql("DROP TABLE b_docs")
    spark.sql("DROP TABLE b_meta")
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
    BucketedLayout.write(docs, "b_a", "doc_id", 4)
    BucketedLayout.write(docs.select(col("doc_id")), "b_b", "doc_id", 3)
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val j = BucketedLayout.read(spark, "b_a").join(BucketedLayout.read(spark, "b_b"), "doc_id")
      // the fallback must actually SHUFFLE (4-bucket and 3-bucket
      // layouts are not co-partitioned; an exchange-free plan here
      // would be assuming co-partitioning that doesn't exist)
      assert(j.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(j.count() == docs.count())   // correctness survives the mismatch
    }
    spark.sql("DROP TABLE b_a")
    spark.sql("DROP TABLE b_b")
  }
}
