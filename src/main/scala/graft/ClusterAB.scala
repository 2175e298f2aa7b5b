package graft

import org.apache.spark.sql.SparkSession

/** Same-session A/B probe for a named query cluster: one JVM, one
  * session, shared caches warmed first (Bench's protocol), then
  * `reps` timed passes over the sorted cluster. Prints one JSON line
  * with per-query min/med/max — run it from two `git worktree`
  * checkouts back-to-back (A B A B) to separate code deltas from this
  * box's up-to-4× cross-session wall-clock drift (PERF.md round-6
  * note). Usage:
  *
  *   sbt "runMain graft.ClusterAB /root/testdata/sf0.1 q29_simhash,q47_x 5"
  */
object ClusterAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq.sorted
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val loadBefore = Bench.loadavg()
    spark.range(1000).selectExpr("sum(id)").collect()
    val tw = System.nanoTime()
    graft.queries.LlmQueries.warmShared(spark, sfDir)
    val warmSec = (System.nanoTime() - tw) / 1e9
    val samples: Map[String, Seq[Double]] = {
      val acc = scala.collection.mutable.Map[String, Vector[Double]]()
        .withDefaultValue(Vector.empty)
      for (_ <- 1 to reps; name <- names) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        acc(name) = acc(name) :+ (System.nanoTime() - t0) / 1e9
      }
      acc.toMap
    }
    def rk(v: Double): String = f"$v%.6f"
    val qs = names.map { n =>
      val ts = samples(n).sorted
      val med = ts(ts.length / 2)
      "\"" + n + "\":{\"min\":" + rk(ts.head) + ",\"med\":" + rk(med) +
        ",\"max\":" + rk(ts.last) + ",\"n\":" + ts.length + "}"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"cluster_ab","sf":"$sfDir","reps":$reps,""" +
      s""""warm_sec":${rk(warmSec)},"loadavg_before":$loadBefore,""" +
      s""""loadavg_after":${Bench.loadavg()},"queries":$qs}""")
    spark.stop()
  }
}
