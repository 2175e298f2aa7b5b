package graft.ros

import org.scalacheck.{Arbitrary, Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import RosPrimitive._

/** Property-based wire-format coverage (SURVEY.md §5): random message
  * definitions + random values → encode → decode ≡ identity, and the
  * flattened schema arity always matches the decoded value count (the
  * alignment invariant the schema/decoder traversal pair relies on).
  */
class RosRoundTripPropSpec extends AnyFunSuite {

  private val scalarPrims: Seq[RosPrimitive] = Seq(
    RBool, RInt8, RUInt8, RInt16, RUInt16, RInt32, RUInt32,
    RInt64, RFloat32, RFloat64, RString, RTime)

  private def genValue(p: RosPrimitive): Gen[Any] = p match {
    case RBool    => Gen.oneOf(true, false)
    case RInt8    => Gen.choose(-128, 127)
    case RUInt8   => Gen.choose(0, 255)
    case RInt16   => Gen.choose(-32768, 32767)
    case RUInt16  => Gen.choose(0, 65535)
    case RInt32   => Arbitrary.arbitrary[Int]
    case RUInt32  => Gen.choose(0L, 0xFFFFFFFFL)
    case RInt64   => Arbitrary.arbitrary[Long]
    case RFloat32 => Arbitrary.arbitrary[Float]
    case RFloat64 => Arbitrary.arbitrary[Double]
    case RString  => Gen.alphaNumStr.map(_.take(50))
    case RTime    => Gen.choose(0, Int.MaxValue)  // first of the (sec,nsec) pair
    case other    => throw new IllegalArgumentException(other.toString)
  }

  private val genField: Gen[RosField] = for {
    p <- Gen.oneOf(scalarPrims)
    name <- Gen.identifier.map(_.take(10))
    isArr <- Gen.frequency(4 -> false, 1 -> (p != RTime && p != RString))
    fixed <- Gen.option(Gen.choose(0, 5))
  } yield RosField(name,
    if (isArr) RosArray(p, fixed) else p, None)

  private val genMsg: Gen[RosMsgDef] = for {
    n <- Gen.choose(1, 8)
    fields <- Gen.listOfN(n, genField)
  } yield RosMsgDef("t/T", fields.zipWithIndex.map { case (f, i) =>
    f.copy(name = s"${f.name}_$i") })  // unique names

  private def genValuesFor(d: RosMsgDef): Gen[List[Any]] =
    Gen.sequence[List[List[Any]], List[Any]](d.fields.map { f =>
      f.tpe match {
        case RTime => Gen.zip(genValue(RTime), genValue(RTime))
          .map(t => List(t._1, t._2))
        case p: RosPrimitive => genValue(p).map(List(_))
        case RosArray(p: RosPrimitive, fixedLen) =>
          val len = fixedLen.map(Gen.const).getOrElse(Gen.choose(0, 6))
          len.flatMap { n =>
            if (Seq(RUInt8, RByte, RChar, RInt8).contains(p))
              Gen.listOfN(n, Gen.choose(-128, 127)).map(bs => List(bs.map(_.toByte).toArray))
            else Gen.listOfN(n, genValue(p)).map(vs => List(vs: Seq[Any]))
          }
        case other => throw new IllegalArgumentException(other.toString)
      }
    }).map(_.flatten)

  test("encode(decode) is the identity and schema arity matches") {
    val prop = Prop.forAll(genMsg.flatMap(d => genValuesFor(d).map(v => (d, v)))) {
      case (d: RosMsgDef, values: List[Any]) =>
        val bundle = RosMsgBundle(d, Map.empty)
        val bytes = RosSchemaMapper.encode(bundle, values)
        val decoded = RosSchemaMapper.decode(bundle, bytes)
        def norm(vs: Seq[Any]): Seq[Any] = vs.map {
          case a: Array[Byte] => a.toSeq
          case f: Float if f.isNaN => "NaN-f"
          case x: Double if x.isNaN => "NaN-d"
          case v => v
        }
        val ok = norm(decoded) == norm(values) &&
          RosSchemaMapper.flatSchema(bundle).size == decoded.size
        if (!ok) println(s"MISMATCH def=$d\n in=${norm(values)}\n out=${norm(decoded)}")
        ok
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
