package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Puts a number on the BucketedLayout claim: the q07-style fact⋈fact
  * join (per-type ⋈ Messages on seqno in the ETL output; here
  * lineitem ⋈ orders on orderkey — the same repeated large–large
  * equi-join shape) timed over the plain parquet layout vs the
  * bucketed layout. Broadcast is disabled so both sides pay the join
  * the way two 50 TB tables would: sort-merge — WITH an Exchange per
  * side on plain parquet, with ZERO Exchanges when both sides are
  * bucketed on the join key with the same bucket count. Prints one
  * JSON line with both medians, the one-time layout write cost, and
  * the verified exchange counts.
  */
object LayoutBench {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    var n = 0
    plan.foreach {
      case _: ShuffleExchangeExec => n += 1
      case _: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => n += 1
      case _ => ()
    }
    n
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", cpus).toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val warehouse = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", warehouse)
      // the 100 TB shape: neither join side is broadcastable
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    // the join alone carries the layout contract (the groupBy's own
    // exchange on o_orderstatus exists in both layouts)
    def join(lineitem: org.apache.spark.sql.DataFrame,
             orders: org.apache.spark.sql.DataFrame) =
      lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
    def q(lineitem: org.apache.spark.sql.DataFrame,
          orders: org.apache.spark.sql.DataFrame) =
      join(lineitem, orders)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val liPlain = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val orPlain = spark.read.parquet(s"$sfDir/orders.parquet")
    val unbucketedShuffles = shuffles(join(liPlain, orPlain))
    val unbucketed = Bench.median((1 to runs).map(_ => timed(q(liPlain, orPlain).count())))

    // one-time layout cost: write both sides bucketed+sorted on the key
    val writeSec = timed {
      graft.operators.BucketedLayout.write(
        liPlain, "li_bucketed", "l_orderkey", buckets)
      graft.operators.BucketedLayout.write(
        orPlain, "or_bucketed", "o_orderkey", buckets)
    }
    val liB = graft.operators.BucketedLayout.read(spark, "li_bucketed")
    val orB = graft.operators.BucketedLayout.read(spark, "or_bucketed")
    val bucketedShuffles = shuffles(join(liB, orB))
    val bucketed = Bench.median((1 to runs).map(_ => timed(q(liB, orB).count())))

    println(s"""{"metric":"layout_join","unit":"sec","runs":$runs,""" +
      s""""unbucketed_sec":$unbucketed,"bucketed_sec":$bucketed,""" +
      s""""layout_write_sec":$writeSec,"buckets":$buckets,""" +
      s""""unbucketed_shuffles":$unbucketedShuffles,"bucketed_shuffles":$bucketedShuffles,""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
    // the layout contract itself: bucketed plans must be exchange-free
    if (bucketedShuffles != 0) sys.exit(1)
  }
}
