package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The amplified-corpus scale probe as a standing artifact: amplify a
  * testdata dir (documents ×10 with shifted ids — every doc becomes a
  * 10-clique of EXACT duplicates, the worst case for pair emitters;
  * embeddings ×4 likewise), then run the SAME suite protocol as Bench
  * (shared-cache warm line items, sorted queries, per-query medians)
  * and print one JSON line `{"metric":"amplified_total",...}`.
  * Previous rounds re-derived this probe by hand in PERF.md prose; a
  * main makes the scale trend reproducible and comparable per round.
  *
  * Env: SPARK_GRAFT_SF_DIR (source, default sf0.01),
  * SPARK_GRAFT_AMPLIFIED_DIR (reuse an existing amplified dir; default
  * a fresh temp dir), SPARK_GRAFT_BENCH_RUNS (default 3),
  * SPARK_GRAFT_DOCS_X / SPARK_GRAFT_EMB_X (amplification factors).
  */
object AmplifiedBench {

  /** Write the amplified copy of `srcDir` into `outDir`: documents
    * replicated docsX times with doc_id shifted by k*(max+1) per copy
    * (texts identical → exact-duplicate cliques), embeddings embX
    * times likewise; every other table copied through unchanged.
    */
  def amplify(spark: SparkSession, srcDir: String, outDir: String,
              docsX: Int, embX: Int): Unit = {
    val src = new org.apache.hadoop.fs.Path(srcDir)
    // the session is in scope — use ITS conf (the thread-ambient helper
    // could resolve a different session's credentials than the reads
    // below); builtWith keeps the helper, it has no session param
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    val tables = fs.listStatus(src).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet"))
    def replicate(name: String, idCol: String, x: Int): Unit = {
      val df = spark.read.parquet(s"$srcDir/$name.parquet")
      val shift = df.agg(max(col(idCol))).head().getLong(0) + 1
      val amped = (0 until x).map(k =>
        df.withColumn(idCol, col(idCol) + lit(k * shift))).reduce(_ union _)
      amped.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }
    tables.foreach {
      case "documents" => replicate("documents", "doc_id", docsX)
      case "embeddings" => replicate("embeddings", "vec_id", embX)
      case other =>
        // byte-for-byte passthrough would be fine too, but rewriting via
        // Spark keeps remote filesystems and nanos-typed events uniform
        val bytes = fs.open(new org.apache.hadoop.fs.Path(s"$srcDir/$other.parquet"))
        val dst = fs.create(new org.apache.hadoop.fs.Path(s"$outDir/$other.parquet"), true)
        try org.apache.hadoop.io.IOUtils.copyBytes(bytes, dst, 1 << 20)
        finally { bytes.close(); dst.close() }
    }
    // marker LAST: its presence certifies a complete build with these
    // exact factors (reuse must not bench half-built or differently-
    // amplified data under this run's labels)
    val mk = fs.create(new org.apache.hadoop.fs.Path(s"$outDir/_amplified.json"), true)
    try mk.write(s"""{"docs_x":$docsX,"emb_x":$embX,"src":"$srcDir"}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally mk.close()
  }

  /** Does `d` hold a COMPLETE amplification with exactly these factors? */
  def builtWith(d: String, docsX: Int, embX: Int): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$d/_amplified.json")
    val fs = p.getFileSystem(graft.ros.bag.RosbagIO.hadoopConf())
    fs.exists(p) && {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      s.contains(s""""docs_x":$docsX""") && s.contains(s""""emb_x":$embX""")
    }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val docsX = sys.env.getOrElse("SPARK_GRAFT_DOCS_X", "10").toInt
    val embX = sys.env.getOrElse("SPARK_GRAFT_EMB_X", "4").toInt
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    // reuse only a dir whose marker certifies a complete build with the
    // SAME factors (half-built or differently-amplified data must not
    // run under this round's labels)
    val outDir = sys.env.get("SPARK_GRAFT_AMPLIFIED_DIR") match {
      case Some(d) if builtWith(d, docsX, embX) => d
      case maybe =>
        val d = maybe.getOrElse(
          java.nio.file.Files.createTempDirectory("graft_amplified").toString)
        amplify(spark, srcDir, d, docsX, embX)
        d
    }
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val Bench.SuiteResult(compact, detail, failed, minimal, _) =
      Bench.timeSuite(spark, outDir, runs)
    val totalLine = s"""{"metric":"amplified_total",$compact,""" +
      s""""src":"$srcDir","docs_x":$docsX,"emb_x":$embX,"sf":"$outDir"}"""
    val detailLine = s"""{"metric":"amplified_detail",$detail,"sf":"$outDir"}"""
    val minLine = s"""{"metric":"amplified_total_min",$minimal,""" +
      s""""docs_x":$docsX,"emb_x":$embX,"sf":"$outDir"}"""
    // committed file = the full record; stdout compact line LAST (the
    // driver capture keeps the tail — see Bench.main). Non-default
    // factors land in their OWN artifact: a one-off ×100 scale probe
    // must not overwrite the standing ×10 record.
    val artifact =
      if (docsX == 10 && embX == 4) "BENCH_amplified.json"
      else s"BENCH_amplified_x${docsX}_e$embX.json"
    Bench.writeArtifact(artifact, Seq(totalLine, detailLine))
    println(detailLine)
    println(totalLine)
    // size-bounded minimal total LAST — see Bench.main
    println(minLine)
    spark.stop()
    if (failed) sys.exit(1)
  }
}
