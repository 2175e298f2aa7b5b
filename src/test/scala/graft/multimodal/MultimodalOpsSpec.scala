package graft.multimodal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase

class MultimodalOpsSpec extends SparkTestBase {
  import MultimodalOps._

  /** Minimal valid PNG header bytes (signature + IHDR length/type +
    * width/height) — enough for header parsing, not a decodable image.
    */
  private def pngHeader(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(24)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes)
    out.putInt(w).putInt(h)
    out.array()
  }

  private def mediaDf(n: Int) = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    val rows = (0 until n).map(i =>
      Row(i.toLong, pngHeader(640 + i, 480 + i) ++ Array.fill(i * 10)(i.toByte)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("PNG/JPEG header metadata parsed without decode") {
    val df = withImageMeta(mediaDf(3), "blob")
    val m = df.orderBy("id").select("media.format", "media.width", "media.height").collect()
    assert(m(0).getString(0) == "png" && m(0).getInt(1) == 640 && m(0).getInt(2) == 480)
    assert(m(2).getInt(1) == 642 && m(2).getInt(2) == 482)
    // JPEG SOF0
    val jpeg = Array(0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x11, 0x08, 0x01, 0x00, 0x02, 0x00)
      .map(_.toByte) ++ Array.fill(8)(0.toByte)
    assert(parseImageMeta(jpeg) == Row("jpeg", 512, 256, 1, null))
    // garbage -> null fields
    assert(parseImageMeta(Array[Byte](1, 2, 3)) == Row(null, null, null, null, null))
  }

  test("JPEG walk handles fill bytes and length-less standalone markers") {
    // APP0 segment (len 4, 2 bytes payload), then 0xFF fill padding,
    // then TEM (0x01) and RST3 (0xD3) standalone markers, then SOF0
    val jpeg = Array(
      0xFF, 0xD8,                         // SOI
      0xFF, 0xE0, 0x00, 0x04, 0xAA, 0xBB, // APP0, len=4
      0xFF, 0xFF, 0xFF, 0x01,             // two fill bytes, then TEM
      0xFF, 0xD3,                         // RST3, no length
      0xFF, 0xC0, 0x00, 0x11, 0x08, 0x01, 0x00, 0x02, 0x00  // SOF0 h=256 w=512
    ).map(_.toByte) ++ Array.fill(8)(0.toByte)
    assert(parseImageMeta(jpeg) == Row("jpeg", 512, 256, 1, null))
    // EOI before any SOF -> dimensions stay null, no crash
    val eoiOnly = Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)
    assert(parseImageMeta(eoiOnly) == Row("jpeg", null, null, 1, null))
  }

  test("decode stub: deterministic features with real batch shape") {
    val df = decodeFeaturesStub(mediaDf(4), "blob", dim = 8)
    assert(df.schema("features").dataType == ArrayType(FloatType, containsNull = false))
    val f1 = df.filter(col("id") === 2).select("features").head().getSeq[Float](0)
    val f2 = decodeFeaturesStub(mediaDf(4), "blob", dim = 8)
      .filter(col("id") === 2).select("features").head().getSeq[Float](0)
    assert(f1 == f2)                // deterministic
    assert(f1.size == 8 && f1.forall(v => v >= 0f && v <= 1f))
  }

  test("frame sampling stub: explode cardinality and keying") {
    val frames = sampleFramesStub(mediaDf(3), "blob", "id", everyNth = 10, maxFrames = 4)
    assert(frames.schema.fieldNames.toSeq == Seq("id", "frame_idx", "frame_data"))
    val perId = frames.groupBy("id").count().orderBy("id").collect().map(_.getLong(1))
    assert(perId.forall(_ >= 1))
    // frame 0 of id 0 is the first 10 bytes of its blob
    val f0 = frames.filter(col("id") === 0 && col("frame_idx") === 0)
      .head().getAs[Array[Byte]]("frame_data")
    assert(f0.length == 10)
  }

  test("blob externalization splits big blobs into side table") {
    val (slim, side) = externalizeBlobs(mediaDf(10), "blob", "id", threshold = 50)
    assert(slim.count() == 10)
    val extIds = slim.filter(col("blob_externalized")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(side.count() == extIds.size && extIds.nonEmpty)
    // externalized rows have null inline blob; others keep it
    assert(slim.filter(col("blob_externalized") && col("blob").isNotNull).count() == 0)
    assert(slim.filter(!col("blob_externalized") && col("blob").isNull).count() == 0)
    // side table join reconstructs the original bytes
    val rejoined = slim.filter(col("blob_externalized"))
      .drop("blob").join(side, "id")
    assert(rejoined.count() == extIds.size)
  }

  test("blob-budget repartitioning sizes partitions by bytes") {
    val df = mediaDf(20)
    val parts = repartitionByBlobBudget(df, "blob", targetBytes = 500)
    assert(parts.rdd.getNumPartitions >= 2)   // ~2KB of blobs / 500B target
    assert(parts.count() == 20)
  }
}
