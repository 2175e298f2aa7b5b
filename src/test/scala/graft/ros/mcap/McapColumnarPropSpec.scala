package graft.ros.mcap

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase
import graft.ros._
import graft.ros.RosPrimitive._

/** Property coverage for the VECTORIZED mcap typed reader: random
  * ros2msg definitions + random values → CdrCodec.encode → write an
  * mcap → typed columnar read must equal the interpreted CDR decoder
  * column-for-column. Any drift between the aligned op-program decode
  * and CdrCodec — alignment bookkeeping, endianness, type widening,
  * NUL-terminated strings — shows up as a value mismatch here. The
  * mcap twin of graft.ros.bag.ColumnarPropSpec.
  */
class McapColumnarPropSpec extends SparkTestBase {

  private val scalarPrims: Seq[RosPrimitive] = Seq(
    RBool, RInt8, RUInt8, RInt16, RUInt16, RInt32, RUInt32,
    RInt64, RUInt64, RFloat32, RFloat64, RString, RWString, RTime, RDuration)

  private def ros2Name(p: RosPrimitive): String = p match {
    case RBool => "bool"; case RInt8 => "int8"; case RUInt8 => "uint8"
    case RInt16 => "int16"; case RUInt16 => "uint16"; case RInt32 => "int32"
    case RUInt32 => "uint32"; case RInt64 => "int64"; case RUInt64 => "uint64"
    case RFloat32 => "float32"; case RFloat64 => "float64"
    case RString => "string"
    case RWString => "wstring"
    case RTime => "builtin_interfaces/Time"
    case RDuration => "builtin_interfaces/Duration"
    case RByte => "byte"; case RChar => "char"
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
    case RWString =>
      // mixed BMP + astral pool: UTF-16 surrogate pairs must survive
      // the wire transcode on both readers
      val pool = "ae\u00e9\u6f22\u2211z" + new String(Character.toChars(0x1F600))
      val cps = pool.codePoints().toArray
      (0 until rng.nextInt(12)).map(_ => new String(
        Character.toChars(cps(rng.nextInt(cps.length))))).mkString
    case other    => throw new IllegalArgumentException(other.toString)
  }

  // builtin_interfaces/Time|Duration lowers to a nested (int32 sec,
  // uint32 nanosec) walk — two values per field
  private def genValues(d: RosMsgDef, rng: scala.util.Random): Seq[Any] =
    d.fields.flatMap { f =>
      f.tpe match {
        case RTime | RDuration =>
          Seq(rng.nextInt(), rng.nextLong() & 0xFFFFFFFFL)
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
    // time/duration arrays map to array-of-struct → row-reader path
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

  private def writeMcapOf(defText: String, payloads: Seq[Array[Byte]])
      : java.nio.file.Path = {
    val f = java.nio.file.Files.createTempFile("mcap_colprop", ".mcap")
    java.nio.file.Files.write(f, McapFormat.writeMcap(
      Seq(McapFormat.McapSchema(1, "t/msg/T", "ros2msg",
        defText.getBytes("UTF-8"))),
      Seq(McapFormat.McapChannel(1, 1, "/p", "cdr")),
      payloads.zipWithIndex.map { case (b, i) =>
        McapFormat.McapMessage(1, i.toLong, 1000L + i, 1000L + i, b)
      }))
    f
  }

  test("mcap typed columnar read ≡ CdrCodec.decode over 20 random schemas") {
    for (caseIdx <- 1 to 20) {
      val d = genMsg.pureApply(Gen.Parameters.default, Seed(caseIdx.toLong))
      val defText = render(d)
      val bundle = Ros2Msg.bundle("t/msg/T", defText)
      val rng = new scala.util.Random(caseIdx * 1000L)
      val payloads = (0 until 5).map(_ =>
        CdrCodec.encode(bundle, genValues(d, rng)))
      val f = writeMcapOf(defText, payloads)
      val df = spark.read.format("mcap")
        .option("schema_name", "t/msg/T").option("includeRaw", "true")
        .load(f.toString)
      assert(graft.ros.bag.RosbagColumnarRead.supportsColumnar(df.schema),
        s"case $caseIdx: expected columnar-supported shapes\n$defText")
      val flat = RosSchemaMapper.flatSchema(bundle)
      val rows = df.orderBy("log_time").collect()
      assert(rows.length == 5, s"case $caseIdx row count")
      rows.foreach { r =>
        val expected = CdrCodec.decode(bundle, r.getAs[Array[Byte]]("data"))
        flat.fieldNames.zip(expected).foreach { case (name, exp) =>
          val colName = if (Set("file_path", "chunk_idx", "offset", "log_time",
            "publish_time", "sequence", "channel_id", "topic", "data",
            "seqno")(name)) name + "_field" else name
          assert(norm(r.getAs[Any](colName)) == norm(exp),
            s"case $caseIdx column $colName\n$defText")
        }
      }
      java.nio.file.Files.delete(f)
    }
  }

  test("xcdr2 payloads (final + delimited, mixed with xcdr1 in one file) columnar ≡ row") {
    import CdrCodec.{Xcdr1, Xcdr2Final, Xcdr2Delimited}
    val flavors = Array(Xcdr1, Xcdr2Final, Xcdr2Delimited)
    for (caseIdx <- 41 to 52) {
      val d = genMsg.pureApply(Gen.Parameters.default, Seed(caseIdx.toLong))
      val defText = render(d)
      val bundle = Ros2Msg.bundle("t/msg/T", defText)
      val rng = new scala.util.Random(caseIdx * 77L)
      // each message picks its own flavor — the reader must dispatch
      // per message off the representation id, not per file
      val payloads = (0 until 6).map(i =>
        CdrCodec.encode(bundle, genValues(d, rng), flavors(i % 3)))
      val f = writeMcapOf(defText, payloads)
      val df = spark.read.format("mcap")
        .option("schema_name", "t/msg/T").option("includeRaw", "true")
        .load(f.toString)
      val flat = RosSchemaMapper.flatSchema(bundle)
      val rows = df.orderBy("log_time").collect()
      assert(rows.length == 6, s"case $caseIdx row count")
      rows.foreach { r =>
        val expected = CdrCodec.decode(bundle, r.getAs[Array[Byte]]("data"))
        flat.fieldNames.zip(expected).foreach { case (name, exp) =>
          val colName = if (Set("file_path", "chunk_idx", "offset", "log_time",
            "publish_time", "sequence", "channel_id", "topic", "data",
            "seqno")(name)) name + "_field" else name
          assert(norm(r.getAs[Any](colName)) == norm(exp),
            s"case $caseIdx column $colName\n$defText")
        }
      }
      java.nio.file.Files.delete(f)
    }
  }

  test("mutable payloads (PL_CDR + PL_CDR2, mixed with all other flavors) columnar ≡ row") {
    import CdrCodec.{Xcdr1, Xcdr2Final, Xcdr2Delimited, Xcdr1Mutable, Xcdr2Mutable}
    val flavors = Array(Xcdr1, Xcdr1Mutable, Xcdr2Final, Xcdr2Delimited, Xcdr2Mutable)
    for (caseIdx <- 61 to 72) {
      val d = genMsg.pureApply(Gen.Parameters.default, Seed(caseIdx.toLong))
      val defText = render(d)
      val bundle = Ros2Msg.bundle("t/msg/T", defText)
      val rng = new scala.util.Random(caseIdx * 99L)
      // one file, five serialization flavors — dispatch is per message
      val payloads = (0 until 10).map(i =>
        CdrCodec.encode(bundle, genValues(d, rng), flavors(i % 5)))
      val f = writeMcapOf(defText, payloads)
      val df = spark.read.format("mcap")
        .option("schema_name", "t/msg/T").option("includeRaw", "true")
        .load(f.toString)
      val flat = RosSchemaMapper.flatSchema(bundle)
      val rows = df.orderBy("log_time").collect()
      assert(rows.length == 10, s"case $caseIdx row count")
      rows.foreach { r =>
        val expected = CdrCodec.decode(bundle, r.getAs[Array[Byte]]("data"))
        flat.fieldNames.zip(expected).foreach { case (name, exp) =>
          val colName = if (Set("file_path", "chunk_idx", "offset", "log_time",
            "publish_time", "sequence", "channel_id", "topic", "data",
            "seqno")(name)) name + "_field" else name
          assert(norm(r.getAs[Any](colName)) == norm(exp),
            s"case $caseIdx column $colName\n$defText")
        }
      }
      // a pruned projection over the mutable payloads still matches —
      // pruned members skip in O(1) by their header length
      val firstCol = flat.fieldNames.head
      val colName = if (Set("file_path", "chunk_idx", "offset", "log_time",
        "publish_time", "sequence", "channel_id", "topic", "data",
        "seqno")(firstCol)) firstCol + "_field" else firstCol
      val pruned = df.orderBy("log_time").select(colName).collect()
      rows.zip(pruned).foreach { case (full, p) =>
        assert(norm(p.get(0)) == norm(full.getAs[Any](colName)),
          s"case $caseIdx pruned column $colName\n$defText")
      }
      java.nio.file.Files.delete(f)
    }
  }

  test("mutable columnar defaults: members absent from the wire land as zero/empty") {
    val defText = "int32 x\nfloat64 v\nstring s\nuint8[] blob\n"
    val bundle = Ros2Msg.bundle("t/msg/T", defText)
    // hand-build a PL_CDR2 payload carrying ONLY x (id 0)
    def le(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val payload = Array[Byte](0, 0x0b, 0, 0) ++ le(8) ++ le(0x20000000) ++ le(77)
    assert(CdrCodec.decode(bundle, payload).take(3) == Seq(77, 0.0, ""))
    val f = writeMcapOf(defText, Seq(payload))
    val r = spark.read.format("mcap").option("schema_name", "t/msg/T")
      .load(f.toString).collect().head
    assert(r.getAs[Int]("x") === 77)
    assert(r.getAs[Double]("v") === 0.0)
    assert(r.getAs[String]("s") === "")
    assert(r.getAs[Array[Byte]]("blob").length === 0)
    java.nio.file.Files.delete(f)
  }

  test("columnar mutable foreign-writer shapes: LC 6/7, extended PID, unknown skip, must-understand") {
    // the engine's own encoder never emits LC 6/7 or extended PIDs —
    // hand-build what a foreign DDS writer would, and pin the
    // VECTORIZED walk (the row-path goldens live in Ros2CdrSpec)
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    val defText = "uint32[] xs\nfloat64[] vs\nint32 x\n"
    val bundle = Ros2Msg.bundle("t/msg/T", defText)
    val vbits = java.lang.Double.doubleToLongBits(2.5)
    val leDouble = (0 until 8).map(i => ((vbits >> (8 * i)) & 0xFF).toByte).toArray
    // PL_CDR2: xs via LC=6 (count×4), vs via LC=7 (count×8), an
    // unknown id 9 (LC=4) to skip, x reordered last via LC=2
    val m2 = le32(0x60000000) ++ le32(2) ++ le32(7) ++ le32(9) ++
      le32(0x70000001) ++ le32(1) ++ leDouble ++
      le32(0x40000009) ++ le32(4) ++ le32(99) ++
      le32(0x20000002) ++ le32(42)
    val pl2 = Array[Byte](0, 0x0b, 0, 0) ++ le32(m2.length) ++ m2
    // PL_CDR: vs via an EXTENDED pid header (xcdr1: the double aligns
    // to 8 from the member's reset origin → count + 4 pad + element =
    // 16 bytes), xs short, x absent → default 0 (sentinel-terminated)
    val pl1 = Array[Byte](0, 0x03, 0, 0) ++
      le16(0x3F01) ++ le16(8) ++ le32(1) ++ le32(16) ++
      le32(1) ++ le32(0) ++ leDouble ++
      le16(0) ++ le16(12) ++ le32(2) ++ le32(7) ++ le32(9) ++
      le16(0x3F02) ++ le16(0)
    assert(CdrCodec.decode(bundle, pl2) == Seq(Seq(7, 9), Seq(2.5), 42))
    assert(CdrCodec.decode(bundle, pl1) == Seq(Seq(7, 9), Seq(2.5), 0))
    val f = writeMcapOf(defText, Seq(pl2, pl1))
    val df = spark.read.format("mcap").option("schema_name", "t/msg/T")
      .load(f.toString)
    assert(graft.ros.bag.RosbagColumnarRead.supportsColumnar(df.schema))
    val rows = df.orderBy("log_time").collect()
    assert(rows.map(r => (norm(r.getAs[Any]("xs")), norm(r.getAs[Any]("vs")),
      r.getAs[Int]("x"))).toSeq ===
      Seq((Seq(7, 9), Seq(2.5), 42), (Seq(7, 9), Seq(2.5), 0)))
    // pruned projection exercises the O(1) member skips around the
    // surviving column
    assert(df.orderBy("log_time").select("x").collect().map(_.getInt(0)).toSeq
      === Seq(42, 0))
    java.nio.file.Files.delete(f)
    // a must-understand UNKNOWN member fails the vectorized walk too
    val mu = m2.clone()
    val emOff = (4 + 4 + 4 + 4) + (4 + 4 + 8) // xs member + vs member
    assert(McapFormat.leInt(mu, emOff) == 0x40000009)
    mu(emOff + 3) = (mu(emOff + 3) | 0x80).toByte
    val bad = Array[Byte](0, 0x0b, 0, 0) ++ le32(mu.length) ++ mu
    val f2 = writeMcapOf(defText, Seq(bad))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("mcap").option("schema_name", "t/msg/T")
        .load(f2.toString).select("x").collect()
    }
    assert(e.getMessage.contains("must-understand") ||
      Option(e.getCause).exists(_.getMessage.contains("must-understand")))
    java.nio.file.Files.delete(f2)
  }

  test("columnar big-endian mutable payloads (0x0a, 0x02) decode identically to the row path") {
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val defText = "int32 x\nfloat64 v\n"
    val bundle = Ros2Msg.bundle("t/msg/T", defText)
    val vbits = java.lang.Double.doubleToLongBits(1.5)
    val beDouble = (0 until 8).map(i => ((vbits >> (8 * (7 - i))) & 0xFF).toByte).toArray
    val m2 = be32(0x20000000) ++ be32(7) ++ be32(0x30000001) ++ beDouble
    val pl2be = Array[Byte](0, 0x0a, 0, 0) ++ be32(m2.length) ++ m2
    val pl1be = Array[Byte](0, 0x02, 0, 0) ++
      be16(0) ++ be16(4) ++ be32(7) ++
      be16(1) ++ be16(8) ++ beDouble ++
      be16(0x3F02) ++ be16(0)
    assert(CdrCodec.decode(bundle, pl2be) == Seq(7, 1.5))
    assert(CdrCodec.decode(bundle, pl1be) == Seq(7, 1.5))
    val f = writeMcapOf(defText, Seq(pl2be, pl1be))
    val rows = spark.read.format("mcap").option("schema_name", "t/msg/T")
      .load(f.toString).orderBy("log_time").collect()
    assert(rows.map(r => (r.getAs[Int]("x"), r.getAs[Double]("v"))).toSeq ===
      Seq((7, 1.5), (7, 1.5)))
    java.nio.file.Files.delete(f)
  }

  test("columnar mutable corrupt-count member overruns loudly, never wraps to a misparse") {
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val defText = "int32 x\n"
    val bundle = Ros2Msg.bundle("t/msg/T", defText)
    // unknown member id 7 with LC=7 and count 0x20000000: 4 + count*8
    // wraps Int to 4 — the walk must refuse via the Long-domain
    // DHEADER bound, not skip 4 bytes and misparse
    val m = le32(0x70000007) ++ le32(0x20000000) ++ le32(0) ++
      le32(0x20000000) ++ le32(42)
    val payload = Array[Byte](0, 0x0b, 0, 0) ++ le32(m.length) ++ m
    val re = intercept[IllegalArgumentException](CdrCodec.decode(bundle, payload))
    assert(re.getMessage.contains("overruns"))
    val f = writeMcapOf(defText, Seq(payload))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("mcap").option("schema_name", "t/msg/T")
        .load(f.toString).select("x").collect()
    }
    assert(e.getMessage.contains("overruns") ||
      Option(e.getCause).exists(_.getMessage.contains("overruns")))
    java.nio.file.Files.delete(f)
  }

  test("big-endian cdr payloads decode identically to the row decoder") {
    val defText = "int32 a\nfloat64 b\nstring s\nuint16 t\n"
    val bundle = Ros2Msg.bundle("t/msg/T", defText)
    // hand-built CDR_BE payload (the encoder only emits LE)
    val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(0x00.toByte).put(0x00.toByte).put(0x00.toByte).put(0x00.toByte)
    bb.putInt(-123456789)              // a @4
    bb.putInt(0)                       // pad to 8 for the double
    bb.putDouble(3.5e10)               // b @12->16 after align
    val sBytes = "héllo".getBytes("UTF-8")
    bb.putInt(sBytes.length + 1)       // string length incl NUL
    bb.put(sBytes).put(0.toByte)
    // align 2 for uint16 relative to origin 4
    while ((bb.position() - 4) % 2 != 0) bb.put(0.toByte)
    bb.putShort(65535.toShort)
    val payload = java.util.Arrays.copyOf(bb.array(), bb.position())
    val expected = CdrCodec.decode(bundle, payload)
    assert(expected === Seq(-123456789, 3.5e10, "héllo", 65535))
    val f = writeMcapOf(defText, Seq(payload))
    val r = spark.read.format("mcap").option("schema_name", "t/msg/T")
      .load(f.toString).collect().head
    assert(r.getAs[Int]("a") === -123456789)
    assert(r.getAs[Double]("b") === 3.5e10)
    assert(r.getAs[String]("s") === "héllo")
    assert(r.getAs[Int]("t") === 65535)
    java.nio.file.Files.delete(f)
  }

  test("array-of-struct projections fall back to the row reader, values intact") {
    val defText = "builtin_interfaces/Time[] stamps\nint64 id\n"
    val bundle = Ros2Msg.bundle("t/msg/T", defText)
    import org.apache.spark.sql.Row
    val payload = CdrCodec.encode(bundle,
      Seq(Seq(Row(5, 7), Row(8, 9)), 42L))
    val f = writeMcapOf(defText, Seq(payload))
    val df = spark.read.format("mcap").option("schema_name", "t/msg/T")
      .load(f.toString)
    assert(!graft.ros.bag.RosbagColumnarRead.supportsColumnar(df.schema),
      "array-of-struct must route to the row reader")
    val r = df.collect().head
    assert(r.getAs[Long]("id") === 42L)
    val stamps = r.getAs[scala.collection.Seq[Row]]("stamps")
    // nanosec is uint32 → LongType in the flattened schema
    assert(stamps.map(x => (x.getInt(0), x.getLong(1))) === Seq((5, 7L), (8, 9L)))
    // ...while a pruned projection of only supported shapes vectorizes
    // (the unsupported column is skip-walked)
    val idOnly = df.select("id")
    assert(idOnly.collect().map(_.getLong(0)).toSeq === Seq(42L))
    java.nio.file.Files.delete(f)
  }
}
