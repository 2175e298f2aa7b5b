package graft.ros.etl

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class BagQueriesSpec extends SparkTestBase {
  test("bagInfo: per-topic stats + rollup totals with broadcast dim join") {
    val bag = BagEtlMain.demoBag()   // 2 connections, 100 messages
    val out = java.nio.file.Files.createTempDirectory("baginfo").toString + "/etl"
    BagEtl.run(spark, bag, out)
    val info = BagQueries.bagInfo(spark, out)
    val rows = info.collect()
    // rollup: 2 topic rows + 1 datatype subtotal + 1 grand total
    assert(rows.length == 4)
    val total = info.filter(col("datatype").isNull).head()
    assert(total.getAs[Long]("n_messages") == 100)
    val perTopic = info.filter(col("topic").isNotNull).collect()
    assert(perTopic.map(_.getAs[Long]("n_messages")).sum == 100)
    assert(perTopic.forall(_.getAs[Double]("freq_hz") > 0))
    // broadcast join planned for the dimension
    val plan = info.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
