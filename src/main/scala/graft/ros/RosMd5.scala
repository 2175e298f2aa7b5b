package graft.ros

import RosPrimitive._

/** The ROS 1 message md5sum — the checksum `rosbag` tooling and the
  * ROS 1 pub/sub handshake use to verify two ends agree on a type's
  * wire layout. Computed per the public genmsg algorithm
  * (genmsg/gentools.py, compute_md5_text): the md5 of a canonical
  * text holding the CONSTANTS first (`<type> <NAME>=<value>`), then
  * the fields in declared order — builtin-typed fields with their
  * declared type text (array suffix KEPT: `float64[9] cov`),
  * complex-typed fields as `<sub_md5> <name>` (array suffix DROPPED;
  * the subtype's md5 computed recursively) — with the trailing
  * newline stripped.
  *
  * Validated against the well-known constants: std_msgs/String
  * 992ce8a1..., std_msgs/Header 2176deca..., geometry_msgs
  * Point/Quaternion/Pose/PoseStamped (RosMd5Spec). Lets the engine
  * write bag connection records REAL rosbag tooling accepts for
  * definitions that never came from a bag (cross-dialect transcode,
  * mcap/db3-harvested ros1 defs exported with md5 "*" before).
  */
object RosMd5 {

  def compute(bundle: RosMsgBundle): String =
    md5Of(bundle, bundle.root, Set.empty)

  /** Convenience over raw ros1msg definition text. */
  def compute(rootName: String, defText: String): String =
    compute(MsgDefParser.parse(rootName, defText))

  private def suffix(fixedLen: Option[Int]): String = fixedLen match {
    case Some(n) => s"[$n]"
    case None => "[]"
  }

  private def md5Of(bundle: RosMsgBundle, msg: RosMsgDef,
      seen: Set[String]): String = {
    require(!seen(msg.fullName),
      s"recursive message definition at ${msg.fullName}")
    val sb = new StringBuilder
    val (consts, fields) = msg.fields.partition(_.isConstant)
    consts.foreach { f =>
      val tn = f.tpe match {
        case p: RosPrimitive => p.name
        case other => throw new IllegalArgumentException(
          s"constant ${f.name} of non-primitive type $other")
      }
      sb.append(tn).append(' ').append(f.name).append('=')
        .append(f.constantValue.get).append('\n')
    }
    fields.foreach { f =>
      f.tpe match {
        case p: RosPrimitive =>
          sb.append(p.name).append(' ').append(f.name)
        case RosArray(p: RosPrimitive, fl) =>
          sb.append(p.name).append(suffix(fl)).append(' ').append(f.name)
        case ref: RosMsgRef =>
          sb.append(md5Of(bundle, bundle.resolve(ref, msg.pkg),
            seen + msg.fullName)).append(' ').append(f.name)
        case RosArray(ref: RosMsgRef, _) =>
          // array suffix dropped for complex types — genmsg quirk,
          // load-bearing for compatibility
          sb.append(md5Of(bundle, bundle.resolve(ref, msg.pkg),
            seen + msg.fullName)).append(' ').append(f.name)
        case RosArray(_: RosArray, _) =>
          throw new IllegalArgumentException("arrays of arrays are not in the ROS IDL")
      }
      sb.append('\n')
    }
    val text = sb.toString.stripSuffix("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }
}
