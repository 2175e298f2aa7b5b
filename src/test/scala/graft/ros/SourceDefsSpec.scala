package graft.ros

import org.scalatest.funsuite.AnyFunSuite
import graft.ros.mcap.{CdrCodec, McapFormat, Ros2Msg}

/** Executor-side per-file definition harvest: late binding for types
  * first seen mid-stream, with freshness against GROWING files (the
  * streaming sources tail still-open containers).
  */
class SourceDefsSpec extends AnyFunSuite {

  private val defText = "string data"

  private def writeMcap(f: java.io.File, types: Seq[String]): Unit = {
    val schemas = types.zipWithIndex.map { case (t, i) =>
      McapFormat.McapSchema(i + 1, t, "ros2msg", defText.getBytes("UTF-8"))
    }
    val channels = types.zipWithIndex.map { case (_, i) =>
      McapFormat.McapChannel(i + 1, i + 1, s"/t$i", "cdr")
    }
    val b = Ros2Msg.bundle(types.head, defText)
    java.nio.file.Files.write(f.toPath, McapFormat.writeMcap(schemas, channels,
      Seq(McapFormat.McapMessage(1, 0L, 1L, 1L, CdrCodec.encode(b, Seq("x"))))))
    ()
  }

  test("a type appended after the first scan is found on a later miss") {
    // negatives re-validate on a throttle; tests want immediacy
    sys.props("graft.sourcedefs.recheck.nanos") = "0"
    try sourceDefsBody()
    finally { sys.props.remove("graft.sourcedefs.recheck.nanos"); () }
  }

  private def sourceDefsBody(): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_srcdefs").toFile
    val f = new java.io.File(dir, "grow.mcap")
    writeMcap(f, Seq("graft_msgs/msg/TA"))
    val p = f.getAbsolutePath
    assert(SourceDefs.variantsFor(p, "graft_msgs/msg/TA").nonEmpty)
    // a genuine miss caches the negative...
    assert(SourceDefs.variantsFor(p, "graft_msgs/msg/TB").isEmpty)
    // ...but the file GROWS (a tailed stream introduced TB): the next
    // miss re-stats, sees new bytes, and finds the definition
    writeMcap(f, Seq("graft_msgs/msg/TA", "graft_msgs/msg/TB"))
    assert(SourceDefs.variantsFor(p, "graft_msgs/msg/TB").nonEmpty,
      "a definition landing after the first scan must be found")
    assert(SourceDefs.variantsFor(p, "graft_msgs/msg/TA").nonEmpty)
    // ros1msg definitions also register under their transcode rename
    val bag = new java.io.File(dir, "b.bag")
    val b1 = MsgDefParser.parse("graft_msgs/R", "int64 x")
    java.nio.file.Files.write(bag.toPath, graft.ros.bag.BagFormat.writeBag(
      Seq(graft.ros.bag.BagFormat.BagConnection(0, "/r", "graft_msgs/R", "*",
        "int64 x", "c")),
      Seq(graft.ros.bag.BagFormat.WriteMessage(0, 1, 0,
        RosSchemaMapper.encode(b1, Seq[Any](1L))))))
    val vs = SourceDefs.variantsFor(bag.getAbsolutePath, "graft_msgs/msg/R")
    assert(vs.map(_._1) === Seq("ros2msg"),
      "the translated shadow entry must serve the renamed type")
  }

  private def writeMcapDefs(f: java.io.File, defs: Seq[(String, String)]): Unit = {
    val schemas = defs.zipWithIndex.map { case ((t, d), i) =>
      McapFormat.McapSchema(i + 1, t, "ros2msg", d.getBytes("UTF-8"))
    }
    val channels = defs.zipWithIndex.map { case (_, i) =>
      McapFormat.McapChannel(i + 1, i + 1, s"/t$i", "cdr")
    }
    val b = Ros2Msg.bundle(defs.head._1, defs.head._2)
    java.nio.file.Files.write(f.toPath, McapFormat.writeMcap(schemas, channels,
      Seq(McapFormat.McapMessage(1, 0L, 1L, 1L, CdrCodec.encode(b, Seq("x"))))))
    ()
  }

  test("a TRANSIENT stat failure must not clobber known-good answers") {
    sys.props("graft.sourcedefs.recheck.nanos") = "0"
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_srcdefs_tr").toFile
      val f = new java.io.File(dir, "gone.mcap")
      writeMcap(f, Seq("graft_msgs/msg/TT"))
      val p = f.getAbsolutePath
      assert(SourceDefs.variantsFor(p, "graft_msgs/msg/TT").nonEmpty)
      // the file vanishes (FS hiccup / rotation race): the recheck's
      // stat fails - the cached positive must keep serving instead of
      // being replaced by the failed reload's empty map (rows written
      // during the outage would degrade permanently)
      assert(f.delete())
      assert(SourceDefs.variantsFor(p, "graft_msgs/msg/TT").nonEmpty,
        "a transient stat failure must serve the cached answer")
      // the file comes back with MORE types: the next recheck sees a
      // real fingerprint again and reloads
      writeMcap(f, Seq("graft_msgs/msg/TT", "graft_msgs/msg/TU"))
      assert(SourceDefs.variantsFor(p, "graft_msgs/msg/TU").nonEmpty)
    } finally { sys.props.remove("graft.sourcedefs.recheck.nanos"); () }
  }

  test("a POSITIVE answer re-validates: a type turning divergent " +
      "mid-tail flips within one recheck window") {
    sys.props("graft.sourcedefs.recheck.nanos") = "0"
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_srcdefs2").toFile
      val f = new java.io.File(dir, "tail.mcap")
      val tp = "graft_msgs/msg/TD"
      writeMcapDefs(f, Seq(tp -> "string data"))
      val p = f.getAbsolutePath
      assert(SourceDefs.ros2DefFor(p, tp).exists(_._2 == "string data"))
      assert(!SourceDefs.ros2DefDivergent(p, tp))
      // the tailed file gains a SECOND, different-layout definition for
      // the same name: with positives re-validating at the throttle,
      // the stale resolution flips to the honest divergence answer —
      // the old behavior kept serving "string data" until JVM restart
      writeMcapDefs(f, Seq(tp -> "string data", tp -> "int64 x\nstring data"))
      assert(SourceDefs.ros2DefFor(p, tp).isEmpty,
        "a divergent type must stop resolving after the recheck window")
      assert(SourceDefs.ros2DefDivergent(p, tp),
        "the divergence must be distinguishable from plain absence")
    } finally { sys.props.remove("graft.sourcedefs.recheck.nanos"); () }
  }
}
