package graft.warc

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** CDX(J) crawl indexing: sidecar generation at the sink, the
  * foreign-archive index pass, byte-range addressing, and the
  * source's indexed random-access read path.
  */
class WarcCdxSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def writeFixture(dir: String, n: Int): Unit =
    WarcExport.prepareHttpResponse(
        (0 until n).map(i =>
          (s"https://s${i % 3}.example.com/doc/$i", s"document body $i"))
          .toDF("u", "t"),
        uri = col("u"), body = encode(col("t"), "UTF-8"),
        httpContentType = lit("text/plain; charset=utf-8"))
      .repartition(3)
      .write.format("warc").mode("overwrite").save(dir)

  test("sink sidecar: sorted CDXJ lines whose byte ranges address their records") {
    val dir = tmp("warc_cdx_sink")
    writeFixture(dir, 12)
    val entries = WarcCdx.driverEntries(dir)
    assert(entries.size === 12)
    // sorted by surt key within each sidecar (per-shard sorted runs)
    entries.groupBy(_._1).foreach { case (_, es) =>
      val keys = es.map(e => (e._2.surt, e._2.timestamp))
      assert(keys === keys.sorted, "sidecar lines must be key-sorted")
    }
    // surt keys come from the shared canonicalizer
    assert(entries.map(_._2).find(_.url.endsWith("/doc/4")).get.surt
      === "com,example,s1)/doc/4")
    // every (offset, length) range holds EXACTLY its record: fetch the
    // bytes directly and parse the one member
    entries.foreach { case (shard, e) =>
      val raf = new java.io.RandomAccessFile(
        new java.io.File(new java.net.URI(shard)), "r")
      try {
        val buf = new Array[Byte](e.length.toInt)
        raf.seek(e.offset); raf.readFully(buf)
        val recs = WarcFormat.records(new WarcFormat.StrictGzipStream(
          new java.io.ByteArrayInputStream(buf))).toSeq
        assert(recs.size === 1)
        assert(recs.head.targetUri === e.url)
      } finally raf.close()
    }
    // line format round-trips
    val line = WarcCdx.render(entries.head._2)
    assert(WarcCdx.parse(line) === entries.head._2)
  }

  test("foreign-archive index pass reproduces the sink's entries") {
    val dir = tmp("warc_cdx_foreign")
    writeFixture(dir, 9)
    val fromSink = WarcCdx.driverEntries(dir).map(_._2)
      .sortBy(e => (e.filename, e.ordinal))
    // delete the sidecars, rebuild via the member-boundary scan
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".cdx"))
      .foreach(f => assert(f.delete()))
    assert(WarcCdx.driverEntries(dir).isEmpty)
    val n = WarcCdx.buildSidecars(spark, dir)
    assert(n === 9)
    val rebuilt = WarcCdx.driverEntries(dir).map(_._2)
      .sortBy(e => (e.filename, e.ordinal))
    assert(rebuilt === fromSink,
      "indexing the shard must reproduce the write-time entries exactly")
  }

  test("indexed read: equals the scan, touches only addressed shards") {
    val dir = tmp("warc_cdx_read")
    writeFixture(dir, 30)
    val urls = Seq(3L, 7L, 20L).map(i => s"https://s${i % 3}.example.com/doc/$i")
    def frame(cdx: Boolean) = {
      val r = spark.read.format("warc")
      (if (cdx) r.option("cdx", "true") else r).load(dir)
        .filter(col("target_uri").isin(urls: _*))
        .select(col("file_path"), col("offset"), col("warc_type"),
          col("record_id"), col("warc_date"), col("target_uri"),
          col("content_type"), col("http_status"), col("payload"))
    }
    val scan = frame(cdx = false).collect().sortBy(_.getString(5))
    val indexed = frame(cdx = true)
    val viaCdx = indexed.collect().sortBy(_.getString(5))
    assert(viaCdx.length === 3)
    // row-for-row identical to the sequential scan, offset included
    scan.zip(viaCdx).foreach { case (a, b) => assert(a === b) }
    assert(new String(viaCdx(0).getAs[Array[Byte]](8), "UTF-8")
      === "document body 3")
    // only shards holding addressed entries get partitions: the three
    // urls hash to (at most) 3 of the 3 shards — address ONE url and
    // the plan must carry exactly one partition
    val one = spark.read.format("warc").option("cdx", "true").load(dir)
      .filter(col("target_uri") === urls.head)
    assert(one.rdd.getNumPartitions === 1,
      "indexed read must prune unaddressed shards at plan time")
    assert(one.count() === 1)
    // a shard without a sidecar is loud under option("cdx")
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".cdx"))
      .foreach(f => assert(f.delete()))
    val ex = intercept[Exception] {
      spark.read.format("warc").option("cdx", "true").load(dir)
        .filter(col("target_uri") === urls.head).count()
    }
    assert(causeMessages(ex).contains("no .cdx sidecar"))
  }

  test("timestamp14 and opaque-uri keys") {
    assert(WarcCdx.timestamp14("2024-03-05T07:09:11Z") === "20240305070911")
    assert(WarcCdx.timestamp14("") === "00000000000000")
    assert(WarcCdx.surtKey("mailto:a@b.c") === "")
    assert(WarcCdx.surtKey(null) === "")
    val e = WarcCdx.CdxEntry("", "00000000000000", "mailto:a@b.c", 0, 0L, 10L,
      "x.warc.gz")
    assert(WarcCdx.parse(WarcCdx.render(e)).url === "mailto:a@b.c")
  }
}
