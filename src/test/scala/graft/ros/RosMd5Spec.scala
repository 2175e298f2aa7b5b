package graft.ros

import org.scalatest.funsuite.AnyFunSuite

/** The genmsg md5 algorithm against the PUBLIC well-known constants —
  * the checksums every ROS 1 installation computes for the common
  * message packages, so a mismatch here means real rosbag tooling
  * would refuse the engine's connection records.
  */
class RosMd5Spec extends AnyFunSuite {

  private val headerDef = "uint32 seq\ntime stamp\nstring frame_id"
  private val pointDef = "float64 x\nfloat64 y\nfloat64 z"

  test("well-known leaf types") {
    assert(RosMd5.compute("std_msgs/String", "string data") ===
      "992ce8a1687cec8c8bd883ec73ca41d1")
    assert(RosMd5.compute("std_msgs/Header", headerDef) ===
      "2176decaecbce78abc3b96ef049fabed")
    assert(RosMd5.compute("geometry_msgs/Point", pointDef) ===
      "4a842b65f413084dc2b10fb484ea7f17")
    assert(RosMd5.compute("geometry_msgs/Quaternion",
      "float64 x\nfloat64 y\nfloat64 z\nfloat64 w") ===
      "a779879fadf0160734f906b8c19c7004")
  }

  test("nested types substitute the subtype md5 (array suffix dropped for complex)") {
    val pointStamped =
      s"""Header header
         |geometry_msgs/Point point
         |================================================================================
         |MSG: std_msgs/Header
         |$headerDef
         |================================================================================
         |MSG: geometry_msgs/Point
         |$pointDef""".stripMargin
    assert(RosMd5.compute("geometry_msgs/PointStamped", pointStamped) ===
      "c63aecb41bfdfd6b7e1fac37c7cbe7bf")
    val poseStamped =
      s"""Header header
         |geometry_msgs/Pose pose
         |================================================================================
         |MSG: std_msgs/Header
         |$headerDef
         |================================================================================
         |MSG: geometry_msgs/Pose
         |geometry_msgs/Point position
         |geometry_msgs/Quaternion orientation
         |================================================================================
         |MSG: geometry_msgs/Point
         |$pointDef
         |================================================================================
         |MSG: geometry_msgs/Quaternion
         |float64 x
         |float64 y
         |float64 z
         |float64 w""".stripMargin
    assert(RosMd5.compute("geometry_msgs/PoseStamped", poseStamped) ===
      "d3812c3cbc69362b77dc0b19b345f8f5")
  }

  test("constants first, builtin arrays keep suffix, complex arrays drop it") {
    // structural check against a hand-built canonical text: genmsg
    // writes constants (type NAME=value) before fields; builtin-typed
    // fields keep their array spec, complex-typed fields render as
    // sub_md5 + name with the spec dropped
    val defText =
      s"""uint8 FLAG=7
         |string NAME=hi # not a comment
         |float64[9] cov
         |uint8[] blob
         |geometry_msgs/Point[] pts
         |int32 plain
         |================================================================================
         |MSG: geometry_msgs/Point
         |$pointDef""".stripMargin
    val pointMd5 = RosMd5.compute("geometry_msgs/Point", pointDef)
    val canonical =
      s"""uint8 FLAG=7
         |string NAME=hi # not a comment
         |float64[9] cov
         |uint8[] blob
         |$pointMd5 pts
         |int32 plain""".stripMargin
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(RosMd5.compute("graft_msgs/WithConsts", defText) === expected)
  }
}
