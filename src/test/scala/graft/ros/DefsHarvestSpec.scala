package graft.ros

import org.scalatest.funsuite.AnyFunSuite
import DefsHarvest.TypeDef

/** The definitions-harvest pure rules: dedupe determinism and the
  * md5 preference (a bag connection's genuine checksum must not be
  * shadowed by the same type harvested from an mcap Schema record).
  */
class DefsHarvestSpec extends AnyFunSuite {

  private def td(name: String, enc: String, text: String,
      md5: String = "*"): TypeDef =
    TypeDef(name, enc, text.getBytes("UTF-8"), md5)

  test("dedupe: first wins among equals, a known md5sum beats '*' either way") {
    val a = td("pkg/T", "ros1msg", "defA")
    val b = td("pkg/T", "ros1msg", "defB")
    assert(DefsHarvest.dedupe(Seq(a, b)) === Seq(a))
    // a later genuine-md5 entry REPLACES an earlier '*' one (the
    // mcap-before-rosbag container sort must not hide the checksum)
    val real = td("pkg/T", "ros1msg", "defR", "0123456789abcdef")
    assert(DefsHarvest.dedupe(Seq(a, real)) === Seq(real))
    // and an earlier genuine one is never displaced
    assert(DefsHarvest.dedupe(Seq(real, a)) === Seq(real))
    // distinct names all survive, order preserved
    val other = td("pkg/U", "ros2msg", "defU")
    assert(DefsHarvest.dedupe(Seq(a, other, real)) === Seq(real, other))
    // the mcap sink's cross-dialect mode: plain first-wins — a bag's
    // genuine md5 must NOT displace a same-named ros2 definition there
    val ros2 = td("pkg/T", "ros2msg", "defM")
    assert(DefsHarvest.dedupe(Seq(ros2, real), preferKnownMd5 = false)
      === Seq(ros2))
  }

  test("isRos2 covers exactly the rosbag2 definition encodings") {
    assert(DefsHarvest.isRos2("ros2msg"))
    assert(DefsHarvest.isRos2("ros2idl"))
    assert(!DefsHarvest.isRos2("ros1msg"))
    assert(!DefsHarvest.isRos2("protobuf"))
    assert(!DefsHarvest.isRos2(""))
  }
}
