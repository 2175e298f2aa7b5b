package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): per-query wall
  * time + Spark job/stage/task counts in one warm JVM, so the fixed
  * per-job scheduling overhead (the dominant term for sub-second
  * queries on local[32]) is attributable separately from real compute.
  * Usage:
  *   sbt "runMain graft.OptProbe <sfDir> <runs> [query ...]"
  */
object OptProbe {
  final class Counter extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var verbose = false
    override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(s.stageInfo.numTasks)
      if (verbose) {
        val i = s.stageInfo
        val ms = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(-1L)
        stageLog.add(f"    stage ${i.stageId}%4d ${ms}%6d ms ${i.numTasks}%4d tasks  ${i.name.take(120)}")
      }
      ()
    }
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0); stageLog.clear() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "org.apache.spark.sql.graftfns.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = new Counter
    spark.sparkContext.addSparkListener(c)
    // same warm protocol as Bench so shared-cache builds don't land on
    // the first probed query
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.queries.LlmQueries.warmShared(spark, sfDir)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val samples = (1 to runs).map { _ =>
        // listener events are async; give the queue a beat to drain
        Thread.sleep(150)
        c.reset()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tb = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        try df.count() catch { case e: Throwable => println(s"[probe] $name FAILED: ${e.getMessage}") }
        val sec = (System.nanoTime() - t1) / 1e9
        Thread.sleep(150)
        (sec, tb, c.jobs.get, c.stages.get, c.tasks.get)
      }
      val med = samples.map(_._1).sorted.apply(samples.length / 2)
      val s = samples.minBy(_._1)
      println(f"[probe] $name%-28s med=$med%6.3f min=${s._1}%6.3f build=${s._2}%6.3f jobs=${s._3}%3d stages=${s._4}%3d tasks=${s._5}%5d")
      if (sys.env.get("GRAFT_PROBE_STAGES").contains("1")) {
        c.verbose = true
        c.reset()
        val df2 = fn(spark, sfDir)
        df2.count()
        Thread.sleep(300)
        c.stageLog.forEach(l => println(l))
        c.verbose = false
      }
    }
    spark.stop()
  }
}
