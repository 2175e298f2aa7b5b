package graft.ros

import graft.SparkTestBase
import graft.ros.mcap.{CdrCodec, McapFormat, Ros2Msg}

/** Per-epoch observability of the streaming container sinks: each
  * epoch commit records the LANDED (rows, files, bytes) from its
  * tasks' commit messages, and [[SinkMetricsListener]] joins those
  * numbers onto Spark's progress events — what a standing fleet
  * normalizer watches.
  */
class SinkMetricsSpec extends SparkTestBase {

  private val strDef = "string data"
  private lazy val r2 = Ros2Msg.bundle("std_msgs/msg/String", strDef)

  private def land(dir: String, name: String, n: Int, t0: Long): Unit = {
    java.nio.file.Files.write(new java.io.File(dir, name).toPath,
      McapFormat.writeMcap(
        Seq(McapFormat.McapSchema(1, "std_msgs/msg/String", "ros2msg",
          strDef.getBytes("UTF-8"))),
        Seq(McapFormat.McapChannel(1, 1, "/t", "cdr")),
        (0 until n).map { i =>
          McapFormat.McapMessage(1, i.toLong, t0 + i * 1000L, t0 + i * 1000L,
            CdrCodec.encode(r2, Seq(s"x$i")))
        }))
    ()
  }

  test("epoch commits record rows/files/bytes; the listener joins them onto progress") {
    val in = java.nio.file.Files.createTempDirectory("graft_metrics_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_metrics_out")
      .toString + "/export"
    val ck = java.nio.file.Files.createTempDirectory("graft_metrics_ck").toString
    val listener = new SinkMetricsListener
    spark.streams.addListener(listener)
    try {
      land(in, "a.mcap", 3, 1700000000000000000L)
      val q1 = Convert.runStream(spark, in, out, "mcap", ck)
      val ids = scala.collection.mutable.Set(q1.id.toString, q1.runId.toString)
      assert(q1.awaitTermination(120000))
      land(in, "b.mcap", 4, 1700000001000000000L)
      val q2 = Convert.runStream(spark, in, out, "mcap", ck)
      ids += q2.runId.toString
      assert(q2.awaitTermination(120000))

      // the registry holds per-epoch landed numbers keyed by the
      // write's queryId — union across id/runIds (the key is whichever
      // Spark handed LogicalWriteInfo)
      val stats = ids.toSeq.map(SinkEpochMetrics.forQuery)
        .reduce(_ ++ _).values.toSeq
      assert(stats.nonEmpty, "no epoch stats recorded")
      assert(stats.map(_.rows).sum === 7,
        s"landed rows must equal the two drains' inputs, got $stats")
      val nonEmpty = stats.filter(_.rows > 0)
      assert(nonEmpty.forall(s => s.files >= 1 && s.bytes > 0),
        s"non-empty epochs must carry files and bytes: $stats")
      // the exported archive agrees with the recorded totals
      assert(spark.read.format("mcap").load(out).count() === 7)

      // listener bridge: progress events eventually carry the sink's
      // numbers (the bus is async — poll)
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var joined = Seq.empty[listener.EpochReport]
      while (joined.isEmpty && System.nanoTime() < deadline) {
        joined = listener.reports.filter(_.sink.exists(_.rows > 0))
        if (joined.isEmpty) Thread.sleep(200)
      }
      assert(joined.nonEmpty,
        s"no progress event joined sink stats; reports=${listener.reports}")
      assert(joined.map(_.sink.get.rows).sum >= 3)
    } finally spark.streams.removeListener(listener)
  }
}
