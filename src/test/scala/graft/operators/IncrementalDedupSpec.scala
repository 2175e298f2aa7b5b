package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class IncrementalDedupSpec extends SparkTestBase {
  import IncrementalDedup._

  private val scheme = LshTuning.minhashScheme(1000L)

  private def setsOf(rows: Seq[(Long, Seq[String])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, false),
      StructField("sh", ArrayType(StringType), true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, s) => Row(i, s) }, 2), schema)
  }

  test("planted cross-corpus near-dups are found with exact jaccard; cross pairs only") {
    val common = (0 until 20).map(i => s"tok$i w${i + 1} w${i + 2}")
    val base = setsOf(Seq(
      1000L -> common,                                    // near-dup target
      1002L -> (0 until 20).map(i => s"other$i x y"),     // unrelated base doc
      1004L -> Seq.empty))                                // empty set: indexes nothing
    val nw = setsOf(Seq(
      1L -> (common :+ "extra shingle one"),              // j = 20/21 vs 1000
      3L -> (0 until 20).map(i => s"new$i a b"),          // unrelated new doc
      5L -> (common :+ "extra shingle one")))             // same set as doc 1
    val got = newVsBase(nw, base, "doc_id", "sh", scheme, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val j = 20.0 / 21.0
    assert(got === Set((1L, 1000L, j), (5L, 1000L, j)),
      "high-sim planted pairs are S-curve-certain for the 1k-doc scheme")
  }

  test("confirmed pairs are a subset of the exact cross-jaccard graph on sf0.001 (parity split)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("t"))
      .select(col("doc_id"), filter(split(col("t"), "\\s+"), x => x =!= "").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), graft.queries.LlmQueries.shingles(col("toks"), 3).as("sh"))
    val nw = docs.filter(pmod(col("doc_id"), lit(2L)) === 1L)
    val base = docs.filter(pmod(col("doc_id"), lit(2L)) === 0L)
    val got = newVsBase(nw, base, "doc_id", "sh", scheme, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute-force exact cross pairs (test-only: the corpus is tiny)
    val a = nw.select(col("doc_id").as("new_id"), col("sh").as("sa"))
    val b = base.select(col("doc_id").as("base_id"), col("sh").as("sb"))
    val exact = a.crossJoin(b)
      .withColumn("shared", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", col("shared").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("shared")))
      .filter(col("jaccard") >= 0.5)
      .select(col("new_id"), col("base_id"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.subsetOf(exact), "phantom pairs are impossible: confirm is exact")
    val certain = exact.filter { case (_, _, j) =>
      math.pow(1.0 - math.pow(j, scheme.rows), scheme.bands) <= 1e-6 }
    assert(certain.subsetOf(got), "S-curve-certain pairs must be recovered")
    got.foreach { case (n, b2, _) =>
      assert(n % 2 == 1 && b2 % 2 == 0, "cross pairs only — never new-new or base-base")
    }
  }

  test("semantic probe: confirmed ⊆ exact cross cos graph; identical vectors always co-cell") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = IvfIndex.train(emb, "vec_id", "embedding", k = 4, iters = 2)
    val nw = emb.filter(pmod(col("vec_id"), lit(2L)) === 1L)
    val base = emb.filter(pmod(col("vec_id"), lit(2L)) === 0L)
    // plant: a new doc carrying an exact copy of a base vector
    val baseRow = base.orderBy(col("vec_id")).limit(1).collect()(0)
    val planted = nw.unionByName(base.orderBy(col("vec_id")).limit(1)
      .select((col("vec_id") + lit(1000001L)).as("vec_id"), col("embedding")))
    val idx = cosIndex(base, "vec_id", "embedding", cents, 2)
    val got = newVsBaseCos(planted, idx, "vec_id", "embedding", cents, 2, 0.40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.foreach { case (n, b, _) =>
      assert(n % 2 == 1 && b % 2 == 0, "cross pairs only")
    }
    // identical vectors share every assigned cell: the planted copy
    // MUST be found, at cos exactly its self-division (1.0 for a
    // nonzero vector)
    val hit = got.filter(_._1 == baseRow.getLong(0) + 1000001L)
    assert(hit.map(_._2).contains(baseRow.getLong(0)))
    // NaN-element embeddings must pair with NOTHING (Java nrm > 0 is
    // false for NaN; without the isnan guard Spark's NaN-greatest
    // ordering would emit phantom (new, base, NaN) pairs)
    val nanRow = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(
        999999L, Seq(Float.NaN, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType), true))))
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val nanVec = nanRow.select(col("vec_id"),
      slice(concat(col("embedding"), array_repeat(lit(1.0f), dim)), 1, dim)
        .as("embedding"))
    val withNan = newVsBaseCos(nanVec, idx, "vec_id", "embedding", cents, 2, -10.0)
      .collect()
    assert(withNan.isEmpty, s"NaN-norm probe emitted phantom pairs: ${withNan.toSeq}")
    // subset: every confirmed pair is in the brute-force exact graph
    import graft.queries.LlmQueries.{dotd, l2}
    val a = planted.select(col("vec_id").as("na"), col("embedding").as("ea"))
    val b = base.select(col("vec_id").as("nb"), col("embedding").as("eb"))
    val exact = a.crossJoin(b)
      .withColumn("la", l2(col("ea"))).withColumn("lb", l2(col("eb")))
      .filter(col("la") > 0 && col("lb") > 0)
      .withColumn("cos", dotd(col("ea"), col("eb")) / (col("la") * col("lb")))
      .filter(col("cos") >= 0.40)
      .collect().map(r => (r.getAs[Long]("na"), r.getAs[Long]("nb"))).toSet
    assert(got.map(t => (t._1, t._2)).toSet.subsetOf(exact))
  }

  test("persisted bucketed index: grow appends under the layout; probe never shuffles the index side") {
    val mk = (ids: Seq[Long]) => setsOf(ids.map(i =>
      i -> (0 until 15).map(j => s"c${i % 5} s$j body")))
    val base = mk(Seq(0L, 2L, 4L, 6L))
    val batch1 = mk(Seq(10L, 12L))
    val batch2 = mk(Seq(21L, 23L))
    saveIndex(bucketIndex(base, "doc_id", "sh", scheme), "inc_idx", 4, scheme)
    grow(bucketIndex(batch1, "doc_id", "sh", scheme), "inc_idx", scheme)
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = candidates(batch2, "doc_id", "sh",
        BucketedLayout.read(spark, "inc_idx"), scheme)
      val viaCatalog = probe.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaRebuild = candidates(batch2, "doc_id", "sh",
        bucketIndex(base.unionByName(batch1), "doc_id", "sh", scheme), scheme)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaCatalog === viaRebuild)
      assert(viaCatalog.nonEmpty)
      // plan property, asserted structurally: the scan node reading
      // inc_idx is NOT below any Exchange (bucketed output feeds the
      // join directly)
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      // the walk must pierce AQE wrapper nodes: a finalized adaptive
      // plan hides every materialized exchange inside a LEAF
      // ShuffleQueryStageExec (no children), so a child-only recursion
      // silently stops at the stage boundary and the assert is vacuous
      // — recurse through .executedPlan/.plan/.child. The property is
      // "the index scan feeds its JOIN with no Exchange in between"
      // (exchanges ABOVE the join — the candidate DISTINCT — are
      // expected and fine).
      def pierce(p: SparkPlan)(f: SparkPlan => Boolean): Boolean = p match {
        case a: AdaptiveSparkPlanExec => f(a.executedPlan)
        case q: QueryStageExec => f(q.plan)
        case other => other.children.exists(f)
      }
      def idxScanNoExchangeBelow(p: SparkPlan): Boolean = p match {
        case _: ShuffleExchangeLike => false     // path crosses a shuffle
        case _: ReusedExchangeExec => false
        case f: FileSourceScanExec => f.toString.contains("inc_idx")
        case other => pierce(other)(idxScanNoExchangeBelow)
      }
      def joinFedDirectly(p: SparkPlan): Boolean = p match {
        case j: BaseJoinExec if j.children.exists(idxScanNoExchangeBelow) => true
        case other => pierce(other)(joinFedDirectly)
      }
      def seesIdxScan(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec => f.toString.contains("inc_idx")
        case e: ShuffleExchangeLike => e.children.exists(seesIdxScan)
        case r: ReusedExchangeExec => seesIdxScan(r.child)
        case other => pierce(other)(seesIdxScan)
      }
      val root = probe.queryExecution.executedPlan
      // self-check the walk CAN see the index scan at all (guards
      // against a future node type hiding it and re-vacuating the test)
      assert(seesIdxScan(root), s"walk lost the index scan entirely:\n$root")
      assert(joinFedDirectly(root),
        s"no join consumes the index scan exchange-free:\n$root")
    } finally {
      prev.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      spark.sql("DROP TABLE inc_idx")
    }
  }

  test("compactIndex folds append files; probe results and bucketed layout survive") {
    val mk = (ids: Seq[Long]) => setsOf(ids.map(i =>
      i -> (0 until 15).map(j => s"c${i % 5} s$j body")))
    saveIndex(bucketIndex(mk(Seq(0L, 2L)), "doc_id", "sh", scheme), "cmp_idx", 4, scheme)
    grow(bucketIndex(mk(Seq(10L, 12L)), "doc_id", "sh", scheme), "cmp_idx", scheme)
    grow(bucketIndex(mk(Seq(20L, 22L)), "doc_id", "sh", scheme), "cmp_idx", scheme)
    val batch = mk(Seq(31L, 33L))
    def probe() = candidates(batch, "doc_id", "sh",
      BucketedLayout.read(spark, "cmp_idx"), scheme)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = probe()
    val rowsBefore = BucketedLayout.read(spark, "cmp_idx").count()
    def dataFiles(): Int = {
      val loc = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("cmp_idx")).location
      new java.io.File(loc).listFiles()
        .count(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
    }
    val filesBefore = dataFiles()
    compactIndex(spark, "cmp_idx")
    assert(probe() === before)
    assert(BucketedLayout.read(spark, "cmp_idx").count() === rowsBefore)
    // compaction's point: the file count drops to O(buckets), never
    // O(grows x buckets) — the aligned write must survive the rewrite
    // (a catalog-table read here silently loses the aligning
    // repartition; compactIndex reads the table's files by path)
    assert(dataFiles() <= 4 && dataFiles() < filesBefore,
      s"compact left ${dataFiles()} files (before: $filesBefore)")
    // the swap carried the scheme stamp (compaction must not strip the
    // contract that guards probes)
    assert(indexScheme(spark, "cmp_idx") === scheme)
    // the rename preserved the BUCKETED layout: same-spec join still
    // plans exchange-free on the index side
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val self = BucketedLayout.read(spark, "cmp_idx")
        .join(BucketedLayout.read(spark, "cmp_idx")
          .select(col("band"), col("bucket"), col("doc_id").as("d2")),
          Seq("band", "bucket"))
      assert(!self.queryExecution.executedPlan.toString.contains("Exchange"),
        "compaction lost the bucket spec")
    } finally {
      prev.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      spark.sql("DROP TABLE cmp_idx")
    }
  }

  test("streaming indexSink: micro-batches grow the table; batch probe sees streamed docs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def doc(seed: Int): String =
      (0 until 30).map(i => s"tok${(seed * 31 + i * 7) % 97}w$i").mkString(" ")
    val mem = MemoryStream[(Long, String)]
    val ck = java.nio.file.Files.createTempDirectory("idx_ck").toString
    def runOnce(): Unit = {
      val sq = graft.streaming.StreamingOps.indexSink(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
        scheme, "stream_idx", 4, ck)
      sq.processAllAvailable(); sq.stop()
    }
    mem.addData((2L, doc(1)), (4L, doc(2)))
    runOnce()
    mem.addData((6L, doc(3)))
    runOnce()
    // a batch probe with a near-copy of a STREAMED doc finds it
    val probeDocs = spark.createDataFrame(Seq((101L, doc(1).replace("w7 ", "w7x ")))
      ).toDF("doc_id", "text")
    val probe = probeDocs
      .select(col("doc_id"), graft.queries.LlmQueries.shingles(
        graft.queries.Tables.tokens(col("text")), 3).as("sh"))
    val got = newVsBase(probe,
      // base sets reconstructed from the same streamed texts (the
      // index holds bucket rows; confirm needs the shingle arrays)
      spark.createDataFrame(Seq((2L, doc(1)), (4L, doc(2)), (6L, doc(3))))
        .toDF("doc_id", "text")
        .select(col("doc_id"), graft.queries.LlmQueries.shingles(
          graft.queries.Tables.tokens(col("text")), 3).as("sh")),
      "doc_id", "sh", scheme, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((101L, 2L)), "near-copy of streamed doc 2 must confirm")
    // and the candidates straight off the STREAM-GROWN table agree
    val cand = candidates(probe, "doc_id", "sh",
      BucketedLayout.read(spark, "stream_idx"), scheme)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((101L, 2L)))
    spark.sql("DROP TABLE stream_idx")
  }

  test("scheme stamp guards: probing or growing a (16,8,2) index under (32,16,2) throws naming both") {
    val mk = (ids: Seq[Long]) => setsOf(ids.map(i =>
      i -> (0 until 15).map(j => s"c${i % 5} s$j body")))
    val built = LshTuning.MinHashScheme(16, 8, 2)
    val drifted = LshTuning.MinHashScheme(32, 16, 2)   // corpus crossed 100k docs
    saveIndex(bucketIndex(mk(Seq(0L, 2L)), "doc_id", "sh", built), "stamp_idx", 4, built)
    try {
      assert(indexScheme(spark, "stamp_idx") === built)
      val probeEx = intercept[IllegalArgumentException] {
        candidatesIn(spark, "stamp_idx", mk(Seq(10L)), "doc_id", "sh", drifted)
      }
      assert(probeEx.getMessage.contains("16,8,2") && probeEx.getMessage.contains("32,16,2"),
        s"mismatch error must name both schemes: ${probeEx.getMessage}")
      assert(probeEx.getMessage.contains("rebandIndex"), "error must point at the fix")
      val growEx = intercept[IllegalArgumentException] {
        grow(bucketIndex(mk(Seq(20L)), "doc_id", "sh", drifted), "stamp_idx", drifted)
      }
      assert(growEx.getMessage.contains("16,8,2") && growEx.getMessage.contains("32,16,2"))
      // the salted fallback is guarded too — the documented viral-corpus
      // path must not reopen the silent-recall hole
      intercept[IllegalArgumentException] {
        candidatesSaltedIn(spark, "stamp_idx", mk(Seq(10L)), "doc_id", "sh", drifted, 4)
      }
      assert(candidatesSaltedIn(spark, "stamp_idx", mk(Seq(10L)), "doc_id", "sh",
          built, 4).collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        candidatesIn(spark, "stamp_idx", mk(Seq(10L)), "doc_id", "sh", built)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      // matched-scheme probe still works — the guard costs one catalog read
      assert(candidatesIn(spark, "stamp_idx", mk(Seq(10L)), "doc_id", "sh", built)
        .collect().nonEmpty)
    } finally spark.sql("DROP TABLE stamp_idx")
  }

  test("unstamped bucketed table refuses probes with a rebuild/migrate pointer") {
    val mk = (ids: Seq[Long]) => setsOf(ids.map(i =>
      i -> (0 until 15).map(j => s"c${i % 5} s$j body")))
    // a pre-stamping index: bare bucket rows written without saveIndex
    BucketedLayout.writeKeys(bucketIndex(mk(Seq(0L, 2L)), "doc_id", "sh", scheme),
      "legacy_idx", Seq("band", "bucket"), 4)
    try {
      val ex = intercept[IllegalStateException] {
        candidatesIn(spark, "legacy_idx", mk(Seq(10L)), "doc_id", "sh", scheme)
      }
      assert(ex.getMessage.contains("rebandIndex"), ex.getMessage)
    } finally spark.sql("DROP TABLE legacy_idx")
  }

  test("rebandIndex migrates the persisted index: post-migration probe ≡ from-scratch new-scheme index") {
    val mk = (ids: Seq[Long]) => setsOf(ids.map(i =>
      i -> (0 until 15).map(j => s"c${i % 5} s$j body")))
    val oldScheme = LshTuning.MinHashScheme(16, 8, 2)
    val newScheme = LshTuning.MinHashScheme(32, 16, 2)
    val corpus = mk(Seq(0L, 2L, 4L, 10L, 12L))
    saveIndex(bucketIndex(mk(Seq(0L, 2L, 4L)), "doc_id", "sh", oldScheme),
      "rb_idx", 4, oldScheme)
    grow(bucketIndex(mk(Seq(10L, 12L)), "doc_id", "sh", oldScheme), "rb_idx", oldScheme)
    try {
      rebandIndex(spark, "rb_idx", corpus, "doc_id", "sh", newScheme)
      assert(indexScheme(spark, "rb_idx") === newScheme, "migration restamps")
      val batch = mk(Seq(20L, 22L))
      val got = candidatesIn(spark, "rb_idx", batch, "doc_id", "sh", newScheme)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fromScratch = candidates(batch, "doc_id", "sh",
        bucketIndex(corpus, "doc_id", "sh", newScheme), newScheme)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === fromScratch)
      assert(got.nonEmpty, "clique-sharing batch docs must hit the migrated index")
      // the old scheme is now the refused one
      intercept[IllegalArgumentException] {
        candidatesIn(spark, "rb_idx", batch, "doc_id", "sh", oldScheme)
      }
      // grows proceed under the new scheme only
      grow(bucketIndex(mk(Seq(30L)), "doc_id", "sh", newScheme), "rb_idx", newScheme)
    } finally spark.sql("DROP TABLE rb_idx")
  }

  test("persisted cos index: centroid stamp guards probes/grows; recellIndex migrates a retrain") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val base = emb.filter(pmod(col("vec_id"), lit(2L)) === 0L)
    val nw = emb.filter(pmod(col("vec_id"), lit(2L)) === 1L)
    val cents = IvfIndex.train(emb, "vec_id", "embedding", k = 4, iters = 2)
    val retrained = IvfIndex.train(emb, "vec_id", "embedding", k = 4, iters = 3)
    assert(centroidFingerprint(cents) !== centroidFingerprint(retrained),
      "fingerprint must move on retrain (bit-exact over the floats)")
    saveCosIndex(cosIndex(base, "vec_id", "embedding", cents, 2),
      "cos_idx", 4, cents, 2)
    try {
      val got = newVsBaseCosIn(spark, "cos_idx", nw, "vec_id", "embedding",
        cents, 2, 0.40).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val direct = newVsBaseCos(nw, cosIndex(base, "vec_id", "embedding", cents, 2),
        "vec_id", "embedding", cents, 2, 0.40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === direct)
      // retrained centroids are refused loudly — never probed silently
      val ex = intercept[IllegalArgumentException] {
        newVsBaseCosIn(spark, "cos_idx", nw, "vec_id", "embedding", retrained, 2, 0.40)
      }
      assert(ex.getMessage.contains("recellIndex"), ex.getMessage)
      intercept[IllegalArgumentException] {
        growCosIndex(cosIndex(nw, "vec_id", "embedding", retrained, 2),
          "cos_idx", retrained, 2)
      }
      // nAssign is part of the recall contract, guarded like the centroids
      intercept[IllegalArgumentException] {
        newVsBaseCosIn(spark, "cos_idx", nw, "vec_id", "embedding", cents, 1, 0.40)
      }
      // migrate the retrain: re-cell, then probe under the new centroids
      recellIndex(spark, "cos_idx", base, "vec_id", "embedding", retrained, 2)
      val migrated = newVsBaseCosIn(spark, "cos_idx", nw, "vec_id", "embedding",
        retrained, 2, 0.40).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val scratch = newVsBaseCos(nw,
        cosIndex(base, "vec_id", "embedding", retrained, 2),
        "vec_id", "embedding", retrained, 2, 0.40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(migrated === scratch)
      intercept[IllegalArgumentException] {
        newVsBaseCosIn(spark, "cos_idx", nw, "vec_id", "embedding", cents, 2, 0.40)
      }
    } finally spark.sql("DROP TABLE cos_idx")
  }

  test("viral bucket: AQE skew-join splits the in-query probe; salted probe bounds the persisted one") {
    // 10^4 base docs with IDENTICAL shingle sets — crawl boilerplate —
    // collapse into ONE (band, bucket) per band, the worst-case key
    // concentration for the probe join
    val viral = (0 until 20).map(i => s"boiler plate$i chunk")
    val hotBase = setsOf((0 until 10000).map(i => (i * 2).toLong -> viral))
    val batch = setsOf(Seq(100001L -> viral, 100003L -> viral,
      100005L -> (0 until 20).map(i => s"other$i x")))
    val idx = bucketIndex(hotBase, "doc_id", "sh", scheme)
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // trip thresholds a 10^4-row bucket clears in a test-sized shuffle
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8192",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val probe = candidates(batch, "doc_id", "sh", idx, scheme)
      val rows = probe.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // 2 viral batch docs × 10^4 base members; the unrelated doc pairs
      // with nothing
      assert(rows.size === 20000)
      assert(rows.forall { case (n, _) => n == 100001L || n == 100003L })
      // AQE split the hot partition: the finalized join reports skew
      // handling (walk pierces the AQE wrapper nodes)
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
      def findSkew(p: SparkPlan): Boolean = p match {
        case a: AdaptiveSparkPlanExec => findSkew(a.executedPlan)
        case q: QueryStageExec => findSkew(q.plan)
        case r: ReusedExchangeExec => findSkew(r.child)
        case j: SortMergeJoinExec if j.isSkewJoin => true
        case j: ShuffledHashJoinExec if j.isSkewJoin => true
        case other => other.children.exists(findSkew)
      }
      assert(findSkew(probe.queryExecution.executedPlan),
        s"no skew-handled join in:\n${probe.queryExecution.executedPlan}")

      // salted fallback: identical rows, and the hot key's work is
      // provably spread — no (band, bucket, salt) group exceeds
      // ~hot/salts on the index side (each group is one task's input)
      val salts = 8
      val salted = candidatesSalted(batch, "doc_id", "sh", idx, scheme, salts)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(salted === rows)
      val maxGroup = idx
        .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(salts)))
        .groupBy(col("band"), col("bucket"), col("salt"))
        .agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head().getLong(0)
      assert(maxGroup <= 2L * 10000 / salts,
        s"salted group of $maxGroup rows — salt did not spread the hot key")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucket index append ≡ rebuild: probing base+batch1 equals probing the grown index") {
    val mk = (ids: Seq[Long]) => setsOf(ids.map(i =>
      i -> (0 until 15).map(j => s"c${i % 7} s$j body")))    // 7 content cliques
    val base = mk(Seq(0L, 2L, 4L))
    val batch1 = mk(Seq(10L, 12L))
    val batch2 = mk(Seq(21L, 23L))
    val grown = bucketIndex(base, "doc_id", "sh", scheme)
      .unionByName(bucketIndex(batch1, "doc_id", "sh", scheme))
    val viaGrown = candidates(batch2, "doc_id", "sh", grown, scheme)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaRebuild = candidates(batch2, "doc_id", "sh",
      bucketIndex(base.unionByName(batch1), "doc_id", "sh", scheme), scheme)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaGrown === viaRebuild)
    assert(viaGrown.nonEmpty, "clique-sharing batch docs must hit the index")
  }
}
