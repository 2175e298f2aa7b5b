package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns as opaque binary + typed
  * metadata — the generalization of the reference's raw `data` blob
  * column (reference MessageTable.cpp:339-343, README.md:106: "you
  * don't lose any data"; blob externalization wishlist
  * rosbag2parquet.cpp:26, README.md:137).
  *
  * The Spark-side plumbing here is REAL (schemas, blob-budget
  * partitioning, mapPartitions batch shape, header parsing); the codec
  * internals are STUBBED deterministically (`stubDecode`) because no
  * image/audio libraries exist in this environment — swap the stub for
  * a real codec without touching the plumbing.
  */
object MultimodalOps {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true)))

  // ---- REAL header parsing (pure bytes, no codec) ----

  /** Parse PNG IHDR / JPEG SOF0 dimensions straight from the blob —
    * metadata extraction without decoding, the exact "read the header
    * before deciding whether to incur I/O for the image" motivation of
    * the reference (README.md:10). Returns null struct fields for
    * unrecognized formats.
    */
  def parseImageMeta(blob: Array[Byte]): Row = {
    def beInt(o: Int): Int =
      ((blob(o) & 0xFF) << 24) | ((blob(o + 1) & 0xFF) << 16) |
        ((blob(o + 2) & 0xFF) << 8) | (blob(o + 3) & 0xFF)
    def beShort(o: Int): Int = ((blob(o) & 0xFF) << 8) | (blob(o + 1) & 0xFF)
    if (blob.length >= 24 &&
        blob(0) == 0x89.toByte && blob(1) == 'P' && blob(2) == 'N' && blob(3) == 'G') {
      Row("png", beInt(16), beInt(20), 1, null)   // IHDR at offset 16/20
    } else if (blob.length >= 4 && blob(0) == 0xFF.toByte && blob(1) == 0xD8.toByte) {
      // JPEG: walk segments to SOF0/SOF2. 0xFF fill bytes may pad
      // between segments, and TEM (0x01) / RST0-7 (0xD0-0xD7) are
      // standalone markers with NO length field — treating either as
      // marker+length would desynchronize the walk on valid files.
      var o = 2
      var res: Row = Row("jpeg", null, null, 1, null)
      var done = false
      while (!done && o + 1 < blob.length) {
        if (blob(o) != 0xFF.toByte) { done = true }
        else {
          var m = o + 1                       // skip consecutive fill bytes
          while (m < blob.length - 1 && blob(m) == 0xFF.toByte) m += 1
          val marker = blob(m) & 0xFF
          if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
            o = m + 1                         // standalone: no length field
          } else if (marker == 0xD9 || m + 2 >= blob.length) {
            done = true                       // EOI or truncated
          } else {
            val len = beShort(m + 1)
            if (marker == 0xC0 || marker == 0xC2) {
              if (m + 7 < blob.length)        // precision @m+3, h @m+4, w @m+6
                res = Row("jpeg", beShort(m + 6), beShort(m + 4), 1, null)
              done = true
            } else o = m + 1 + len
          }
        }
      }
      res
    } else Row(null, null, null, null, null)
  }

  /** Attach parsed media metadata as a typed struct column. */
  def withImageMeta(df: DataFrame, blobCol: String, out: String = "media"): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields :+ StructField(out, mediaMetaSchema, nullable = true))
    val rows = df.rdd.mapPartitions(_.map { r =>
      Row.fromSeq(r.toSeq :+ parseImageMeta(r.getAs[Array[Byte]](blobCol)))
    })
    spark.createDataFrame(rows, schema)
  }

  // ---- blob-budget partitioning ----

  /** Repartition so each partition holds roughly `targetBytes` of blob
    * payload — media rows are KB..MB-scale, so row-count-based
    * partitioning mis-sizes tasks by orders of magnitude. One cheap
    * metadata pass (sum of lengths) sizes the shuffle.
    */
  def repartitionByBlobBudget(df: DataFrame, blobCol: String,
                              targetBytes: Long = 128L << 20): DataFrame = {
    val total = df.agg(coalesce(sum(length(col(blobCol)).cast("long")), lit(0L)))
      .head().getLong(0)
    val parts = math.max(1, math.min(10000, (total / targetBytes).toInt + 1))
    df.repartition(parts)
  }

  // ---- STUBBED decode / feature ops (deterministic fakes) ----

  /** STUB: "decode" an image blob to a fixed-size feature vector. The
    * batch shape is real — rows are processed per-partition with a
    * reusable "codec" context (the expensive-init pattern of real
    * decoders); the pixel math is a deterministic fake from the blob
    * bytes (no image libs in this container).
    */
  def decodeFeaturesStub(df: DataFrame, blobCol: String, dim: Int = 16,
                         out: String = "features"): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields :+
      StructField(out, ArrayType(FloatType, containsNull = false), nullable = false))
    val rows = df.rdd.mapPartitions { it =>
      // per-partition "codec init" happens once, like a real decoder ctx
      val codecSeed = 0x5EED
      it.map { r =>
        val blob = r.getAs[Array[Byte]](blobCol)
        val feats = Array.tabulate(dim) { i =>
          var h = codecSeed + i
          var j = i
          while (j < blob.length) { h = h * 31 + blob(j); j += dim }
          (h & 0xFFFF) / 65535.0f
        }
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** STUB: frame sampling for video blobs — emits one row per sampled
    * frame index with a frame-slice blob. Real plumbing: explode
    * cardinality, per-frame keying; fake: the "frame" is a byte slice.
    */
  def sampleFramesStub(df: DataFrame, blobCol: String, idCol: String,
                       everyNth: Int = 10, maxFrames: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_data", BinaryType, nullable = false)))
    val rows = df.select(idCol, blobCol).rdd.mapPartitions(_.flatMap { r =>
      val blob = r.getAs[Array[Byte]](1)
      val nFrames = math.min(maxFrames, math.max(1, blob.length / everyNth))
      (0 until nFrames).map { f =>
        val start = f * everyNth
        val end = math.min(blob.length, start + everyNth)
        Row(r.get(0), f, java.util.Arrays.copyOfRange(blob, start, math.max(start, end)))
      }
    })
    spark.createDataFrame(rows, schema)
  }

  // ---- blob externalization (reference wishlist) ----

  /** Split rows with blobs above `threshold` into a side table keyed by
    * `keyCol` (reference rosbag2parquet.cpp:26 "emit blobs as a
    * standalone table"; README.md:137). Returns (slim main, side).
    * The main table keeps small blobs inline and nulls out big ones —
    * scan-heavy queries stop paying for image bytes they don't read.
    */
  def externalizeBlobs(df: DataFrame, blobCol: String, keyCol: String,
                       threshold: Int = 1 << 20): (DataFrame, DataFrame) = {
    val big = col("__len") > threshold
    val withLen = df.withColumn("__len", length(col(blobCol)))
    val slim = withLen
      .withColumn(blobCol, when(big, lit(null)).otherwise(col(blobCol)))
      .withColumn(s"${blobCol}_externalized", big)
      .drop("__len")
    val side = withLen.filter(big).select(col(keyCol), col(blobCol)).drop("__len")
    (slim, side)
  }
}
