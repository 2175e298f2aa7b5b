package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection harness: print the formatted physical plan of a
  * declared query and time its execution. Usage:
  *   sbt "runMain graft.Explain q27_ngram_jaccard /root/testdata/sf0.1"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // some operators (componentsAuto, PrefixSum, trained models) run
    // eager jobs while BUILDING the DataFrame — time that separately
    // so their cost is visible here the way Bench charges it
    val tb = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    val buildSec = (System.nanoTime() - tb) / 1e9
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    val coldSec = (System.nanoTime() - t0) / 1e9
    // second run with every shared cache materialized — the number
    // comparable to Bench's post-warm medians
    val t1 = System.nanoTime()
    df.count()
    val warmSec = (System.nanoTime() - t1) / 1e9
    println(f"EXPLAIN_RESULT name=$name rows=$n sec=$coldSec%.2f " +
      f"warmSec=$warmSec%.2f buildSec=$buildSec%.2f")
    spark.stop()
  }
}
