package graft.warc

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The DSv2 warc WRITE sink: framing round trips through the strict
  * reader, overwrite/commit protocol, deterministic record ids,
  * header round-trips, streaming exactly-once naming.
  */
class WarcSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("batch round trip: responses + conversions, gzip and plain") {
    val docs = Seq(
      (1L, "first page text", "https://ex.com/doc/1"),
      (2L, "café € text — non-ascii", "https://ex.com/doc/2"),
      (3L, "third", "https://ex.com/doc/3")).toDF("id", "text", "uri")
    for (gz <- Seq(true, false)) {
      val dir = tmp(s"warc_sink_rt_$gz")
      WarcExport.prepareHttpResponse(docs, uri = col("uri"),
          body = encode(col("text"), "UTF-8"),
          httpContentType = lit("text/plain; charset=utf-8"))
        .repartition(2)
        .write.format("warc").mode("overwrite")
        .option("gzip", gz.toString).save(dir)
      val back = spark.read.format("warc").load(dir)
        .filter(col("warc_type") === "response")
        .select(col("target_uri"), col("http_status"),
          col("http_content_type"), col("payload"), col("record_id"))
        .collect()
      assert(back.length === 3)
      val byUri = back.map(r => r.getString(0) ->
        (r.getInt(1), new String(r.getAs[Array[Byte]](3), "UTF-8"))).toMap
      assert(byUri("https://ex.com/doc/2") === (200, "café € text — non-ascii"),
        "http head split + body byte fidelity through the sink")
      assert(back.forall(_.getString(4).startsWith("<urn:uuid:")),
        "deterministic record ids generated")
      // extension matches the framing; every shard carries its .cdx
      // sidecar (on by default)
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.isFile && !f.getName.startsWith(".") &&
          !f.getName.endsWith(".cdx"))
      assert(files.nonEmpty && files.forall(
        _.getName.endsWith(if (gz) ".warc.gz" else ".warc")))
      assert(files.forall(f =>
        new java.io.File(WarcCdx.sidecarPath(f.getAbsolutePath)).isFile),
        "each shard publishes its cdx sidecar")
    }
  }

  test("conversion records: WET shape, refers-to round-trips as a column") {
    val dir = tmp("warc_sink_wet")
    val rows = Seq(
      ("https://ex.com/doc/1", "extracted one", "<urn:uuid:src-1>"),
      ("https://ex.com/doc/2", "extracted two", "<urn:uuid:src-2>"))
      .toDF("uri", "text", "src")
    WarcExport.prepareConversion(rows, uri = col("uri"), text = col("text"),
        refersTo = col("src"))
      .write.format("warc").mode("overwrite").save(dir)
    val back = spark.read.format("warc").load(dir)
      .select("warc_type", "target_uri", "content_type", "refers_to", "payload")
      .collect()
    assert(back.length === 2)
    assert(back.forall(_.getString(0) === "conversion"))
    assert(back.forall(_.getString(2).startsWith("text/plain")))
    val m = back.map(r => r.getString(1) ->
      (r.getString(3), new String(r.getAs[Array[Byte]](4), "UTF-8"))).toMap
    assert(m("https://ex.com/doc/1") === ("<urn:uuid:src-1>", "extracted one"))
    // payload_digest header round-trips too
    val dir2 = tmp("warc_sink_digest")
    WarcExport.prepare(rows, warcType = lit("revisit"),
        payload = lit(Array.emptyByteArray), targetUri = col("uri"),
        payloadDigest = lit("sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ"))
      .write.format("warc").mode("overwrite").save(dir2)
    val digests = spark.read.format("warc").load(dir2)
      .select("payload_digest").collect().map(_.getString(0)).toSeq
    assert(digests === Seq.fill(2)("sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ"))
  }

  test("overwrite replaces the previous generation; append adds") {
    val dir = tmp("warc_sink_ow")
    def write(n: Int, mode: String): Unit =
      WarcExport.prepareConversion(
        (1 to n).map(i => (s"https://ex.com/$i", s"text $i")).toDF("u", "t"),
        uri = col("u"), text = col("t"))
        .coalesce(1).write.format("warc").mode(mode).save(dir)
    write(3, "overwrite")
    assert(spark.read.format("warc").load(dir).count() === 3)
    write(2, "overwrite")
    assert(spark.read.format("warc").load(dir).count() === 2,
      "overwrite must not leave the old generation's shards")
    write(3, "append")
    assert(spark.read.format("warc").load(dir).count() === 5)
  }

  test("deterministic ids: two writes of the same rows render identical records") {
    val rows = Seq(("https://ex.com/a", "same text")).toDF("u", "t")
    def idsOf(dir: String): Seq[String] = {
      WarcExport.prepareConversion(rows, uri = col("u"), text = col("t"))
        .write.format("warc").mode("overwrite").save(dir)
      spark.read.format("warc").load(dir)
        .select("record_id").collect().map(_.getString(0)).toSeq
    }
    assert(idsOf(tmp("warc_sink_d1")) === idsOf(tmp("warc_sink_d2")),
      "replayed writes must produce byte-identical record identity")
  }

  test("null payload / warc_type fail loudly") {
    val dir = tmp("warc_sink_null")
    val bad = Seq(("x", null: String)).toDF("u", "t")
    val ex = intercept[Exception] {
      WarcExport.prepare(bad, warcType = lit("resource"),
          payload = col("t").cast("binary"), targetUri = col("u"))
        .write.format("warc").mode("overwrite").save(dir)
    }
    // either layer may fire first — Spark's table-schema non-null
    // assertion or the writer's own guard; both are loud and name the
    // column before any bytes land
    val msg = causeMessages(ex)
    assert(msg.contains("null 'payload'") ||
      (msg.contains("NOT_NULL") && msg.contains("payload")), msg)
  }

  test("streaming: exactly-once epochs, deterministic names, append-only") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp("warc_sink_stream")
    val ckpt = tmp("warc_sink_ckpt")
    val in = MemoryStream[(String, String)]
    val q = WarcExport.prepareConversion(
        in.toDF().toDF("u", "t"), uri = col("u"), text = col("t"))
      .writeStream.format("warc").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start(dir)
    in.addData(("https://ex.com/1", "one"), ("https://ex.com/2", "two"))
    q.processAllAvailable(); q.stop()
    val q2 = WarcExport.prepareConversion(
        in.toDF().toDF("u", "t"), uri = col("u"), text = col("t"))
      .writeStream.format("warc").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start(dir)
    in.addData(("https://ex.com/3", "three"))
    q2.processAllAvailable(); q2.stop()
    val uris = spark.read.format("warc").load(dir)
      .select("target_uri").collect().map(_.getString(0)).sorted.toSeq
    assert(uris === Seq("https://ex.com/1", "https://ex.com/2",
      "https://ex.com/3"), "each row exactly once across restarts")
    val names = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.endsWith(".cdx")).map(_.getName)
    assert(names.forall(_.matches("part-\\d{5}-q[0-9a-f-]{8}-e\\d+\\.warc\\.gz")),
      s"deterministic epoch names, got ${names.mkString(", ")}")
    // truncate per epoch is refused
    val ex = intercept[Exception] {
      WarcExport.prepareConversion(in.toDF().toDF("u", "t"),
          uri = col("u"), text = col("t"))
        .writeStream.format("warc")
        .outputMode("complete")
        .option("checkpointLocation", tmp("warc_sink_ckpt2"))
        .start(tmp("warc_sink_trunc"))
    }
    assert(causeMessages(ex).toLowerCase.contains("append") ||
      causeMessages(ex).toLowerCase.contains("complete"))
  }
}
