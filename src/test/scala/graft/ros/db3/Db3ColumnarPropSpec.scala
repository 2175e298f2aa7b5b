package graft.ros.db3

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase
import graft.ros._
import graft.ros.RosPrimitive._
import graft.ros.mcap.{CdrCodec, Ros2Msg}

/** Property coverage for the VECTORIZED db3 typed reader: random
  * ros2msg definitions + random values → CdrCodec.encode → write a
  * .db3 → typed columnar read must equal the interpreted CDR decoder
  * column-for-column (the db3 sibling of McapColumnarPropSpec — the
  * op program is shared, so this pins the db3-side row iteration,
  * inflation and filter/limit handling around it).
  */
class Db3ColumnarPropSpec extends SparkTestBase {

  private val scalarPrims: Seq[RosPrimitive] = Seq(
    RBool, RInt8, RUInt8, RInt16, RUInt16, RInt32, RUInt32,
    RInt64, RUInt64, RFloat32, RFloat64, RString)

  private def ros2Name(p: RosPrimitive): String = p match {
    case RBool => "bool"; case RInt8 => "int8"; case RUInt8 => "uint8"
    case RInt16 => "int16"; case RUInt16 => "uint16"; case RInt32 => "int32"
    case RUInt32 => "uint32"; case RInt64 => "int64"; case RUInt64 => "uint64"
    case RFloat32 => "float32"; case RFloat64 => "float64"
    case RString => "string"
    case other => throw new IllegalArgumentException(other.toString)
  }

  private def render(d: RosMsgDef): String =
    d.fields.map { f =>
      f.tpe match {
        case p: RosPrimitive => s"${ros2Name(p)} ${f.name}"
        case RosArray(p: RosPrimitive, Some(n)) => s"${ros2Name(p)}[$n] ${f.name}"
        case RosArray(p: RosPrimitive, None) => s"${ros2Name(p)}[] ${f.name}"
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
    case other    => throw new IllegalArgumentException(other.toString)
  }

  private def genValues(d: RosMsgDef, rng: scala.util.Random): Seq[Any] =
    d.fields.flatMap { f =>
      f.tpe match {
        case p: RosPrimitive => Seq(genValue(p, rng))
        case RosArray(p: RosPrimitive, fixedLen) =>
          val n = fixedLen.getOrElse(rng.nextInt(6))
          if (Seq(RUInt8, RByte, RChar, RInt8).contains(p))
            Seq(Array.fill(n)((rng.nextInt(256) - 128).toByte))
          else Seq(Seq.fill(n)(genValue(p, rng)))
        case other => throw new IllegalArgumentException(other.toString)
      }
    }

  private val genField: Gen[RosField] = for {
    p <- Gen.oneOf(scalarPrims)
    name <- Gen.identifier.map(_.take(10))
    isArr <- Gen.frequency(3 -> false, 1 -> true)
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

  private def writeDb3Of(defText: String, payloads: Seq[Array[Byte]],
      perMessageZstd: Boolean = false): java.nio.file.Path = {
    val f = java.nio.file.Files.createTempFile("db3_colprop", ".db3")
    val db = SqliteFormat.writeDb(Seq(
      ("topics", "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT, serialization_format TEXT, offered_qos_profiles TEXT)",
        Seq(Seq[Any](null, "/p", "t/msg/T", "cdr", ""))),
      ("messages", "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, timestamp INTEGER, data BLOB)",
        payloads.zipWithIndex.map { case (b, i) =>
          val stored = if (perMessageZstd) com.github.luben.zstd.Zstd.compress(b) else b
          Seq[Any](null, 1L, 1000L + i, stored)
        }),
      ("message_definitions", "CREATE TABLE message_definitions(id INTEGER PRIMARY KEY, topic_type TEXT, encoding TEXT, encoded_message_definition TEXT, type_hash TEXT)",
        Seq(Seq[Any](null, "t/msg/T", "ros2msg", defText, "")))))
    java.nio.file.Files.write(f, db)
    f
  }

  test("db3 typed columnar read ≡ CdrCodec.decode over 15 random schemas") {
    for (caseIdx <- 1 to 15) {
      val d = genMsg.pureApply(Gen.Parameters.default, Seed(caseIdx.toLong))
      val defText = render(d)
      val bundle = Ros2Msg.bundle("t/msg/T", defText)
      val rng = new scala.util.Random(caseIdx * 777L)
      val payloads = (0 until 5).map(_ =>
        CdrCodec.encode(bundle, genValues(d, rng)))
      val f = writeDb3Of(defText, payloads)
      val df = spark.read.format("db3")
        .option("schema_name", "t/msg/T").option("includeRaw", "true")
        .load(f.toString)
      assert(graft.ros.bag.RosbagColumnarRead.supportsColumnar(df.schema),
        s"case $caseIdx: expected columnar-supported shapes\n$defText")
      val flat = RosSchemaMapper.flatSchema(bundle)
      val rows = df.orderBy("timestamp").collect()
      assert(rows.length == 5, s"case $caseIdx row count")
      rows.foreach { r =>
        val expected = CdrCodec.decode(bundle, r.getAs[Array[Byte]]("data"))
        flat.fieldNames.zip(expected).foreach { case (name, exp) =>
          val colName = if (Set("file_path", "msg_id", "timestamp", "topic_id",
            "topic", "data", "seqno")(name)) name + "_field" else name
          assert(norm(r.getAs[Any](colName)) == norm(exp),
            s"case $caseIdx column $colName\n$defText")
        }
      }
      java.nio.file.Files.delete(f)
    }
  }

  test("db3 mutable payloads (PL_CDR + PL_CDR2) columnar ≡ row — shared op program") {
    import CdrCodec.{Xcdr1, Xcdr1Mutable, Xcdr2Mutable}
    val flavors = Array(Xcdr1, Xcdr1Mutable, Xcdr2Mutable)
    for (caseIdx <- 31 to 36) {
      val d = genMsg.pureApply(Gen.Parameters.default, Seed(caseIdx.toLong))
      val defText = render(d)
      val bundle = Ros2Msg.bundle("t/msg/T", defText)
      val rng = new scala.util.Random(caseIdx * 31L)
      val payloads = (0 until 6).map(i =>
        CdrCodec.encode(bundle, genValues(d, rng), flavors(i % 3)))
      val f = writeDb3Of(defText, payloads)
      val df = spark.read.format("db3")
        .option("schema_name", "t/msg/T").option("includeRaw", "true")
        .load(f.toString)
      val flat = RosSchemaMapper.flatSchema(bundle)
      val rows = df.orderBy("timestamp").collect()
      assert(rows.length == 6, s"case $caseIdx row count")
      rows.foreach { r =>
        val expected = CdrCodec.decode(bundle, r.getAs[Array[Byte]]("data"))
        flat.fieldNames.zip(expected).foreach { case (name, exp) =>
          val colName = if (Set("file_path", "msg_id", "timestamp", "topic_id",
            "topic", "data", "seqno")(name)) name + "_field" else name
          assert(norm(r.getAs[Any](colName)) == norm(exp),
            s"case $caseIdx column $colName\n$defText")
        }
      }
      java.nio.file.Files.delete(f)
    }
  }

  test("message-mode zstd payloads inflate inside the columnar walk; filters + limit hold") {
    val defText = "int64 v\nstring s\n"
    val bundle = Ros2Msg.bundle("t/msg/T", defText)
    val payloads = (0 until 30).map(i =>
      CdrCodec.encode(bundle, Seq(i.toLong, s"m-$i")))
    val f = writeDb3Of(defText, payloads, perMessageZstd = true)
    val df = spark.read.format("db3").option("schema_name", "t/msg/T")
      .load(f.toString)
    assert(df.count() === 30)
    import org.apache.spark.sql.functions.col
    // pushed timestamp filter evaluates pre-decode; surviving rows
    // decode correctly even when earlier batch passes yield nothing
    val cut = df.filter(col("timestamp") >= 1020L)
      .select("v", "s").orderBy("v").collect()
    assert(cut.map(_.getLong(0)).toSeq === (20L until 30L))
    assert(cut.map(_.getString(1)).toSeq === (20 until 30).map(i => s"m-$i"))
    // pushed limit counts surviving rows only
    assert(df.filter(col("timestamp") >= 1020L).limit(3).count() === 3)
    java.nio.file.Files.delete(f)
  }
}
