package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Export-throughput bench for the three container sinks — the WRITE
  * direction's counterpart to the query gate: time
  * `events → prepare → df.write.format(fmt)` at the given SF, plus a
  * read-back aggregate over each sink's own output (the "can the
  * metadata/agg machinery consume what we emit" check).
  *
  * Per format, median of 3 full writes into a fresh dir each run (the
  * sinks never overwrite in place; each run's dir is deleted after
  * timing so disk stays bounded). Reports rows/s and MB/s of payload.
  * Artifact: `BENCH_sink.json` (one JSON line per format + a total
  * line with loadavg before/after, same contract as the other
  * lifecycle benches). Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  */
object SinkBench {
  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime(); body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "org.apache.spark.sql.graftfns.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadBefore = Bench.loadavg()

    // the export frame: every event, topic per type, payload = props
    // bytes — materialized once so the timings charge the SINKS, not
    // the parquet scan
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"),
        (unix_micros(col("ts").cast("timestamp")) * lit(1000L)).as("ts_ns"),
        col("event_type"), encode(col("props"), "UTF-8").as("payload"))
      .persist()
    val rows = ev.count()
    val bytes = ev.agg(sum(length(col("payload")))).head().getLong(0)
    val mb = bytes / 1e6

    def prepareAll(df: DataFrame): Map[String, DataFrame] = Map(
      "mcap" -> graft.ros.mcap.McapExport.prepare(df,
        topic = concat(lit("/"), col("event_type")),
        logTimeNs = col("ts_ns"), data = col("payload"),
        schemaName = lit("graft/Props"), sequence = col("event_id")),
      "rosbag" -> graft.ros.bag.BagExport.prepare(df,
        topic = concat(lit("/"), col("event_type")),
        timeNs = col("ts_ns"), data = col("payload"),
        datatype = lit("graft/Props")),
      "db3" -> graft.ros.db3.Db3Export.prepare(df,
        topic = concat(lit("/"), col("event_type")),
        timestampNs = col("ts_ns"), data = col("payload"),
        tpe = lit("graft/Props")),
      // the fourth container: HTTP-response records, one per row —
      // the crawl-export direction (member gzip unless overridden)
      "warc" -> graft.warc.WarcExport.prepareHttpResponse(df,
        uri = concat(lit("https://fleet.example.com/"), col("event_type"),
          lit("/"), col("event_id").cast("string")),
        body = col("payload"),
        httpContentType = lit("application/octet-stream")))
    val prepared = prepareAll(ev)

    // variants: (label, format, extra write options)
    val variants: Seq[(String, String, Map[String, String])] = Seq(
      ("mcap_zstd", "mcap", Map.empty),
      ("rosbag_lz4", "rosbag", Map.empty),
      ("rosbag_none", "rosbag", Map("compression" -> "none")),
      ("db3_plain", "db3", Map.empty),
      ("db3_zstd_file", "db3",
        Map("compression_format" -> "zstd", "compression_mode" -> "file")),
      ("warc_gz", "warc", Map.empty),
      ("warc_plain", "warc", Map("gzip" -> "false")))

    // BYTE-bound axis: the events payloads average ~9 bytes, so the
    // rows above measure per-message overhead. Real robotics payloads
    // are KB-scale — a second group exports 25k rows of deterministic
    // 4 KiB payloads (~100 MB) so the MB/s figure reflects the encode
    // path, not record framing.
    val fat = spark.read.parquet(s"$dir/events.parquet")
      .orderBy(col("event_id")).limit(25000)
      .select(col("event_id"),
        (unix_micros(col("ts").cast("timestamp")) * lit(1000L)).as("ts_ns"),
        col("event_type"),
        encode(repeat(md5(col("event_id").cast("string")), 128), "UTF-8")
          .as("payload"))
      .persist()
    val fatRows = fat.count()
    val fatMb = fat.agg(sum(length(col("payload")))).head().getLong(0) / 1e6

    val preparedFat = prepareAll(fat)

    val fatVariants: Seq[(String, String, Map[String, String])] = Seq(
      ("mcap_zstd_fat", "mcap", Map.empty),
      ("rosbag_lz4_fat", "rosbag", Map.empty),
      ("db3_plain_fat", "db3", Map.empty),
      ("warc_gz_fat", "warc", Map.empty))

    val parts = cpus.toInt
    val root = java.nio.file.Files.createTempDirectory("graft_sink_bench")
    def cleanup(p: java.io.File): Unit = {
      org.apache.commons.io.FileUtils.deleteQuietly(p); ()
    }

    def measure(group: Map[String, DataFrame], nRows: Long,
        vs: Seq[(String, String, Map[String, String])]) =
      vs.map { case (label, fmt, opts) =>
        val writes = (0 until 3).map { i =>
          val out = new java.io.File(root.toFile, s"$label-$i")
          val s = timed {
            val w = group(fmt).repartition(parts)
              .write.format(fmt).mode("append")
            opts.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
              .save(out.getAbsolutePath)
          }
          (s, out)
        }
        val med = Bench.median(writes.map(_._1))
        // read-back: the sink's own output serves the grouped "info"
        // aggregate (metadata-agg pushdown where the format supports it)
        val readBack = timed {
          // each sink's own grouped read-back: topic for the robotics
          // containers (metadata-agg pushdown where supported),
          // warc_type for crawl shards
          val df = spark.read.format(fmt).load(writes.last._2.getAbsolutePath)
          val n =
            if (fmt == "warc")
              df.groupBy("warc_type").count().collect().map(_.getLong(1)).sum
            else df.groupBy("topic").count().collect().map(_.getLong(1)).sum
          require(n == nRows, s"$label read-back: $n != $nRows")
        }
        writes.foreach(w => cleanup(w._2))
        (label, med, readBack)
      }

    val results = measure(prepared, rows, variants)
    val fatResults = measure(preparedFat, fatRows, fatVariants)

    // END-TO-END convert at BYTE scale: FleetBench's convert axis is
    // file-count-bound (3,600 tiny files); this one feeds the ~100 MB
    // fat archive through Convert.run (mixed-spine read → time-range
    // layout → mcap re-encode) — the normalize-a-fleet MB/s when
    // bytes, not file opens, dominate.
    val convSrc = new java.io.File(root.toFile, "conv_src")
    preparedFat("mcap").repartition(parts).write.format("mcap")
      .mode("append").save(convSrc.getAbsolutePath)
    val convSecs = (0 until 3).map { i =>
      val out = new java.io.File(root.toFile, s"conv_out-$i")
      val s = timed {
        graft.ros.Convert.run(spark, convSrc.getAbsolutePath,
          out.getAbsolutePath, "mcap", partitions = parts)
      }
      cleanup(out)
      s
    }
    val convMed = Bench.median(convSecs)
    cleanup(root.toFile)

    def detailOf(rs: Seq[(String, Double, Double)], nRows: Long, nMb: Double) =
      rs.map { case (label, w, r) =>
        f""""$label":{"write_sec":${math.rint(w * 1e6) / 1e6}%s,"rows_per_sec":${math.rint(nRows / w).toLong}%s,"mb_per_sec":${math.rint(nMb / w * 10) / 10}%s,"readback_sec":${math.rint(r * 1e6) / 1e6}%s}"""
      }.mkString(",")
    val line =
      s"""{"metric":"sink_throughput","unit":"sec","sf_dir":"$dir","rows":$rows,"payload_mb":${math.rint(mb * 10) / 10},"fat_rows":$fatRows,"fat_payload_mb":${math.rint(fatMb * 10) / 10},"cpus":$cpus,"runs":3,${detailOf(results, rows, mb)},${detailOf(fatResults, fatRows, fatMb)},"convert_fat":{"sec":${Bench.rk(convMed)},"mb_per_sec":${math.rint(fatMb / convMed * 10) / 10}},"loadavg":{"before":$loadBefore,"after":${Bench.loadavg()}}}"""
    Bench.writeArtifact("BENCH_sink.json", Seq(line))
    println(line)
    spark.stop()
  }
}
