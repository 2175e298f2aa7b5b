package graft.ros.bag

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase
import graft.ros._
import graft.ros.RosPrimitive._

/** Property coverage for the VECTORIZED reader: random message
  * definitions + random values → write a bag → typed columnar read
  * must equal the interpreted decoder column-for-column. This is the
  * cross-IMPLEMENTATION analog of RosRoundTripPropSpec (which proves
  * encode∘decode ≡ id for the interpreted pair): any drift between the
  * op-program decode and RosSchemaMapper — offset bookkeeping, type
  * widening, string sanitation — shows up as a value mismatch here.
  */
class ColumnarPropSpec extends SparkTestBase {

  private val scalarPrims: Seq[RosPrimitive] = Seq(
    RBool, RInt8, RUInt8, RInt16, RUInt16, RInt32, RUInt32,
    RInt64, RUInt64, RFloat32, RFloat64, RString, RTime, RDuration)

  private def idlName(p: RosPrimitive): String = p match {
    case RBool => "bool"; case RInt8 => "int8"; case RUInt8 => "uint8"
    case RInt16 => "int16"; case RUInt16 => "uint16"; case RInt32 => "int32"
    case RUInt32 => "uint32"; case RInt64 => "int64"; case RUInt64 => "uint64"
    case RFloat32 => "float32"; case RFloat64 => "float64"
    case RString => "string"; case RTime => "time"; case RDuration => "duration"
    case RByte => "byte"; case RChar => "char"
  }

  private def render(d: RosMsgDef): String =
    d.fields.map { f =>
      f.tpe match {
        case p: RosPrimitive => s"${idlName(p)} ${f.name}"
        case RosArray(p: RosPrimitive, Some(n)) => s"${idlName(p)}[$n] ${f.name}"
        case RosArray(p: RosPrimitive, None) => s"${idlName(p)}[] ${f.name}"
        case other => throw new IllegalArgumentException(other.toString)
      }
    }.mkString("\n") + "\n"

  private def genValue(p: RosPrimitive, rng: scala.util.Random): Any = p match {
    case RBool    => rng.nextBoolean()
    case RInt8    => (rng.nextInt(256) - 128)
    case RUInt8   => rng.nextInt(256)
    case RInt16   => rng.nextInt(65536) - 32768
    case RUInt16  => rng.nextInt(65536)
    case RInt32   => rng.nextInt()
    case RUInt32  => (rng.nextLong() & 0xFFFFFFFFL)
    case RInt64 | RUInt64 => rng.nextLong()
    case RFloat32 => if (rng.nextInt(10) == 0) Float.NaN else rng.nextFloat() * 1e6f
    case RFloat64 => if (rng.nextInt(10) == 0) Double.NaN else rng.nextDouble() * 1e12
    case RString  => rng.alphanumeric.take(rng.nextInt(20)).mkString
    case RTime | RDuration => rng.nextInt(Int.MaxValue)
    case other    => throw new IllegalArgumentException(other.toString)
  }

  private def genValues(d: RosMsgDef, rng: scala.util.Random): Seq[Any] =
    d.fields.flatMap { f =>
      f.tpe match {
        case RTime | RDuration => Seq(genValue(RTime, rng), genValue(RTime, rng))
        case p: RosPrimitive => Seq(genValue(p, rng))
        case RosArray(p: RosPrimitive, fixedLen) =>
          val n = fixedLen.getOrElse(rng.nextInt(6))
          if (Seq(RUInt8, RByte, RChar, RInt8).contains(p))
            Seq(Array.fill(n)((rng.nextInt(256) - 128).toByte))
          else Seq(Seq.fill(n)(genValue(p, rng)))
        case other => throw new IllegalArgumentException(other.toString)
      }
    }

  // string ARRAYS are allowed (variable-length elements inside a
  // variable-length array — the hardest offset-bookkeeping shape the
  // vectorized reader supports); time/duration arrays are not (they
  // map to array-of-struct, which routes to the row reader)
  private val genField: Gen[RosField] = for {
    p <- Gen.oneOf(scalarPrims)
    name <- Gen.identifier.map(_.take(10))
    isArr <- Gen.frequency(3 -> false, 1 -> (p != RTime && p != RDuration))
    fixed <- Gen.option(Gen.choose(0, 4))
  } yield RosField(name, if (isArr) RosArray(p, fixed) else p, None)

  private val genMsg: Gen[RosMsgDef] = for {
    n <- Gen.choose(1, 8)
    fields <- Gen.listOfN(n, genField)
  } yield RosMsgDef("t/T", fields.zipWithIndex.map { case (f, i) =>
    f.copy(name = s"f${i}_${f.name}") })

  private def norm(v: Any): Any = v match {
    case a: Array[Byte] => a.toSeq
    case s: scala.collection.Seq[_] => s.map(norm).toSeq
    case f: Float if f.isNaN => "NaN-f"
    case d: Double if d.isNaN => "NaN-d"
    case x => x
  }

  test("columnar typed read ≡ interpreted decode over 20 random schemas") {
    for (caseIdx <- 1 to 20) {
      val d = genMsg.pureApply(Gen.Parameters.default, Seed(caseIdx.toLong))
      val bundle = RosMsgBundle(d, Map.empty)
      val defText = render(d)
      // the def text must parse back to the same wire layout
      val reparsed = MsgDefParser.parse("t/T", defText)
      val rng = new scala.util.Random(caseIdx * 1000L)
      val msgs = (0 until 5).map { m =>
        val values = genValues(d, rng)
        BagFormat.WriteMessage(0, 1700000000 + m, 0,
          RosSchemaMapper.encode(bundle, values))
      }
      val conn = BagFormat.BagConnection(0, "/p", "t/T", s"md5$caseIdx", defText, "/n")
      val bag = java.nio.file.Files.createTempFile(s"prop$caseIdx", ".bag")
      java.nio.file.Files.write(bag, BagFormat.writeBag(Seq(conn), msgs, 3))

      val df = spark.read.format("rosbag")
        .option("datatype", "t/T").option("includeRaw", "true").load(bag.toString)
      assert(RosbagColumnarRead.supportsColumnar(df.schema),
        s"case $caseIdx: expected columnar-supported shapes\n$defText")
      val flat = RosSchemaMapper.flatSchema(reparsed)
      val rows = df.orderBy("time_sec").collect()
      assert(rows.length == 5, s"case $caseIdx row count")
      rows.foreach { r =>
        val expected = RosSchemaMapper.decode(reparsed, r.getAs[Array[Byte]]("data"))
        flat.fieldNames.zip(expected).foreach { case (name, exp) =>
          val colName = if (Set("chunk_idx", "offset", "time_sec", "time_nsec",
            "connection_id", "data", "seqno")(name)) name + "_field" else name
          assert(norm(r.getAs[Any](colName)) == norm(exp),
            s"case $caseIdx column $colName\n$defText")
        }
      }
      java.nio.file.Files.delete(bag)
    }
  }
}
