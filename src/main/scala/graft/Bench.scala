package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "org.apache.spark.sql.graftfns.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up JVM/codegen/parquet-reader paths so the first timed query
    // doesn't carry one-time init (~1-3s of janino + Hadoop FS setup).
    spark.range(1000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/nation.parquet").count()
    catch { case _: Throwable => () }
    // Per-query median of N runs: this box has co-tenant load that swings
    // single-shot timings by up to 10x (round-1 q19: 0.9-8.1s on identical
    // plans), so one sample per query is noise, not signal.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    require(runs >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $runs")
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // true median: mean of the middle two for even run counts
      val median = if (times.length % 2 == 1) times(times.length / 2)
        else (times(times.length / 2 - 1) + times(times.length / 2)) / 2
      name -> median
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
