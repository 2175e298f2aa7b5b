package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import graft.SparkTestBase

class IvfIndexSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("train is deterministic and returns k centroids of the right dim") {
    val a = IvfIndex.train(emb, "vec_id", "embedding", k = 4, iters = 2)
    val b = IvfIndex.train(emb, "vec_id", "embedding", k = 4, iters = 2)
    assert(a.size == 4 && a.map(_.id) == Seq(0, 1, 2, 3))
    assert(a.zip(b).forall { case (x, y) => x.vec.sameElements(y.vec) })
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    assert(a.forall(_.vec.length == dim))
  }

  test("assignment is map-only: no join, no window, no extra shuffle") {
    val cents = IvfIndex.train(emb, "vec_id", "embedding", k = 4, iters = 1)
    val plan = IvfIndex.assign(emb, "embedding", cents).queryExecution.executedPlan
    val nodes = plan.collect { case p => p }
    assert(!nodes.exists(_.isInstanceOf[WindowExec]), "argmax must not use a window")
    assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeExec]), "assignment must not shuffle")
    assert(!nodes.exists(n => n.isInstanceOf[BroadcastNestedLoopJoinExec] ||
      n.isInstanceOf[CartesianProductExec]), "assignment must not cross-join centroids")
  }

  test("every vector lands in its true nearest cell (matches driver-side argmax)") {
    val cents = IvfIndex.train(emb, "vec_id", "embedding", k = 4, iters = 2)
    val assigned = IvfIndex.assign(emb, "embedding", cents)
      .select(col("vec_id"), col("cell"), col("embedding")).collect()
    assigned.foreach { r =>
      val v = r.getSeq[Float](2).toArray
      val best = IvfIndex.probeCells(v, cents, 1).head
      assert(r.getInt(1) == best, s"vec ${r.getLong(0)}")
    }
  }

  test("built index probes with partition pruning and finds exact top-k with nProbe=k") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    val cents = IvfIndex.build(emb, "vec_id", "embedding", dir, k = 4, iters = 2)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    // nProbe = k probes everything → exact; ask for 6 because the
    // query vector itself (cos = 1) occupies one slot
    val got = IvfIndex.probe(spark, dir, "vec_id", "embedding", cents, q,
      nProbe = 4, topK = 6).filter(col("vec_id") =!= 0).collect()
    assert(got.length == 5)
    // partition pruning: a 1-cell probe plan reads only that partition
    val pruned = spark.read.parquet(dir).filter(col("cell") === cents.head.id)
    val scanned = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata.get("PartitionFilters").toSeq
    }.flatten
    assert(scanned.exists(_.contains("cell")), s"no cell partition filter in scan: $scanned")
    // and the pruned read returns exactly the one cell
    assert(pruned.select(col("cell")).distinct().count() == 1)
  }

  test("filtered probe with nProbe=k equals the exact filtered top-k (q68 semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_f").toString + "/idx"
    val cents = IvfIndex.build(emb, "vec_id", "embedding", dir, k = 4, iters = 2)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    // metadata predicate: the q68 keep-set (en-language docs)
    val keep = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("lang") === "en")
      .select(col("doc_id").as("vec_id"))
    val keepIds = keep.collect().map(_.getLong(0)).toSet
    val got = IvfIndex.probeFiltered(spark, dir, "vec_id", "embedding", cents, q,
      nProbe = 4, topK = 5, keep = keep.filter(col("vec_id") =!= 0))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // every result honors the predicate
    assert(got.forall(t => keepIds.contains(t._1)), s"non-keep ids in $got")
    // nProbe = k probes every cell → must equal the exact filtered scan
    val exact = graft.SparkEntry.queries("q68_filtered_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq == exact.map(_._1).toSeq,
      s"ids: index=${got.map(_._1).toSeq} exact=${exact.map(_._1).toSeq}")
    // with real pruning (nProbe = 1) results still honor the predicate
    val pruned = IvfIndex.probeFiltered(spark, dir, "vec_id", "embedding", cents, q,
      nProbe = 1, topK = 5, keep = keep).collect().map(_.getLong(0))
    assert(pruned.forall(keepIds.contains))
    // and a keep-set missing the id column fails loudly
    intercept[IllegalArgumentException] {
      IvfIndex.probeFiltered(spark, dir, "vec_id", "embedding", cents, q,
        nProbe = 1, topK = 5, keep = keep.withColumnRenamed("vec_id", "doc_id"))
    }
  }

  test("save/load round-trips the model; a fresh session probes identically") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_model").toString + "/m"
    val cents = IvfIndex.train(emb, "vec_id", "embedding", k = 4, iters = 2)
    IvfIndex.save(spark, dir, cents)
    // a FRESH session (no shared per-session state) loads the stored model
    val s2 = spark.newSession()
    val loaded = IvfIndex.load(s2, dir)
    assert(loaded.map(_.id) == cents.map(_.id))
    assert(loaded.zip(cents).forall { case (a, b) => a.vec.sameElements(b.vec) },
      "loaded centroids must be bit-identical to the trained ones")
    // probe outputs from the loaded model are unchanged
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    assert(IvfIndex.probeCells(q, loaded, 2) == IvfIndex.probeCells(q, cents, 2))
    // absence and half-written dirs read as "no model"
    assert(IvfIndex.loadIfExists(spark, dir + "_nope").isEmpty)
    val crash = java.nio.file.Files.createTempDirectory("ivf_crash").toString
    emb.limit(1).write.mode("overwrite").parquet(s"$crash/centroids.parquet")
    assert(IvfIndex.loadIfExists(spark, crash).isEmpty,
      "payload without the manifest commit marker must read as absent")
    // a dir holding another model type fails loudly
    graft.operators.ModelIO.writeManifest(spark, crash, Map("type" -> "pq"))
    intercept[IllegalArgumentException] { IvfIndex.load(spark, crash) }
  }
}
