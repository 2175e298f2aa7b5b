package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{BucketedLayout, IncrementalDedup, LshTuning}

/** Amplified-scale measurement of the persisted dedup index lifecycle
  * — the operations IncrementalDedup spec-pins for correctness, timed
  * as they would run in production: grow N batches into the bucketed
  * index, probe with a FIXED batch after every grow (the claim under
  * test: probe cost stays ~flat as the index grows, because the
  * persisted side never re-shuffles), then compact (file counts drop
  * back to the bucket count) and reband to a new scheme (migration
  * cost is one corpus rewrite).
  *
  * Prints one JSON line and writes the full record to
  * `BENCH_index.json`. Env: SPARK_GRAFT_SF_DIR (default sf0.01),
  * SPARK_GRAFT_DOCS_X (amplification, default 20), SPARK_GRAFT_BATCHES
  * (default 10), SPARK_GRAFT_CPUS (default 4).
  */
object IndexBench {

  private def medianOf3(body: => Long): (Double, Long) = {
    val samples = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (Bench.median(samples.map(_._1)), samples.head._2)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val docsX = sys.env.getOrElse("SPARK_GRAFT_DOCS_X", "20").toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warehouse = java.nio.file.Files.createTempDirectory("graft_idxbench_wh")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", warehouse.toString)
      .config("spark.sql.extensions", "org.apache.spark.sql.graftfns.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // corpus: documents amplified docsX times with shifted ids (exact-
    // duplicate cliques — the hot-bucket-leaning shape), 3-gram shingle
    // sets derived once and persisted (the staged relation a real
    // pipeline grows the index from)
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val shift = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val amped = (0 until docsX).map(k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k * shift))).reduce(_ union _)
    val sets = amped
      .withColumn("toks", split(lower(col("text")), "\\W+"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        graft.queries.LlmQueries.shingles(col("toks"), 3).as("sh"))
      .persist()
    val total = sets.count()
    System.err.println(s"corpus: $total docs (docsX=$docsX), $nBatches batches")
    val scheme = LshTuning.minhashScheme(total)

    // fixed probe batch: the LAST batch's sets — never grown into the
    // index, so every probe answers the same question against a larger
    // index (flatness is meaningful)
    val batch: Int => DataFrame =
      b => sets.filter(pmod(col("doc_id"), lit(nBatches)) === b)
    val probe = batch(nBatches - 1).persist()
    probe.count()

    val table = "idxbench_idx"
    val buckets = 32
    import org.apache.spark.sql.catalyst.TableIdentifier
    def files(): Int = {
      val loc = spark.sessionState.catalog
        .getTableMetadata(TableIdentifier(table)).location
      new java.io.File(loc).listFiles()
        .count(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")) // data files only, not crc sidecars
    }

    val growSec = scala.collection.mutable.ArrayBuffer[Double]()
    val probeSec = scala.collection.mutable.ArrayBuffer[Double]()
    val fileCounts = scala.collection.mutable.ArrayBuffer[Int]()
    var cands = 0L
    (0 until nBatches - 1).foreach { b =>
      val t0 = System.nanoTime()
      val rows = IncrementalDedup.bucketIndex(batch(b), "doc_id", "sh", scheme)
      if (b == 0) IncrementalDedup.saveIndex(rows, table, buckets, scheme)
      else IncrementalDedup.grow(rows, table, scheme)
      growSec += (System.nanoTime() - t0) / 1e9
      val (pSec, pCands) = medianOf3(
        IncrementalDedup.candidatesIn(spark, table, probe, "doc_id", "sh", scheme)
          .count())
      probeSec += pSec
      cands = pCands
      fileCounts += files()
    }

    val filesBefore = files()
    val t1 = System.nanoTime()
    IncrementalDedup.compactIndex(spark, table)
    val compactSec = (System.nanoTime() - t1) / 1e9
    val filesAfter = files()
    val (probeAfterSec, candsAfter) = medianOf3(
      IncrementalDedup.candidatesIn(spark, table, probe, "doc_id", "sh", scheme)
        .count())
    require(candsAfter == cands,
      s"compaction changed probe results: $cands -> $candsAfter")

    // migration: reband the full grown corpus (batches 0..n-2) to the
    // next corpus-size tier's scheme; probing under the OLD scheme must
    // then be refused (the stamp guard), the new one must work
    val grown = sets.filter(pmod(col("doc_id"), lit(nBatches)) =!= (nBatches - 1))
    val newScheme = LshTuning.minhashScheme(20000000L)
    val t2 = System.nanoTime()
    IncrementalDedup.rebandIndex(spark, table, grown, "doc_id", "sh", newScheme)
    val rebandSec = (System.nanoTime() - t2) / 1e9
    val (probeNewSec, _) = medianOf3(
      IncrementalDedup.candidatesIn(spark, table, probe, "doc_id", "sh", newScheme)
        .count())

    def arr(xs: Seq[Double]) = xs.map(Bench.rk).mkString("[", ",", "]")
    val line =
      s"""{"metric":"index_bench","docs":$total,"batches":$nBatches,""" +
      s""""buckets":$buckets,"grow_sec":${arr(growSec.toSeq)},""" +
      s""""probe_sec":${arr(probeSec.toSeq)},"probe_cands":$cands,""" +
      s""""files":${fileCounts.mkString("[", ",", "]")},""" +
      s""""compact_sec":${Bench.rk(compactSec)},""" +
      s""""files_before_compact":$filesBefore,"files_after_compact":$filesAfter,""" +
      s""""probe_after_compact_sec":${Bench.rk(probeAfterSec)},""" +
      s""""reband_sec":${Bench.rk(rebandSec)},""" +
      s""""probe_new_scheme_sec":${Bench.rk(probeNewSec)},""" +
      s""""loadavg":${Bench.loadavg()},"sf":"$srcDir"}"""
    Bench.writeArtifact("BENCH_index.json", Seq(line))
    println(line)
    spark.stop()
  }
}
