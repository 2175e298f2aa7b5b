package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.queries.Tables

class PqIndexSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))

  test("training is deterministic and codes are within [0, k)") {
    val m1 = PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val m2 = PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    assert(m1.books.map(_.words.map(_.toSeq).toSeq) ==
           m2.books.map(_.words.map(_.toSeq).toSeq))
    val codes = PqIndex.encode(emb, "embedding", m1)
      .select(col("pqcode")).collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 4 && c.forall(j => j >= 0 && j < 8)))
  }

  test("ADC score equals the dot of the query with the reconstructed codewords") {
    val model = PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 8, iters = 1)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val rows = PqIndex.encode(emb, "embedding", model)
      .withColumn("adc", PqIndex.adcScore(q, model))
      .select(col("pqcode"), col("adc")).limit(20).collect()
    rows.foreach { r =>
      val code = r.getSeq[Int](0)
      // reconstruct: concatenate the chosen codewords, dot with q
      val recon = model.books.flatMap(b => b.words(code(b.sub))).toArray
      val expect = recon.zip(q).foldLeft(0.0)((a, p) => a + p._1.toDouble * p._2.toDouble)
      assert(math.abs(r.getDouble(1) - expect) < 1e-6)
    }
  }

  test("quantization error decreases with codebook size") {
    def mse(k: Int): Double = {
      val model = PqIndex.train(emb, "vec_id", "embedding", m = 4, k = k, iters = 2)
      val rows = PqIndex.encode(emb, "embedding", model)
        .select(col("embedding"), col("pqcode")).collect()
      rows.map { r =>
        val v = r.getSeq[Float](0); val code = r.getSeq[Int](1)
        val recon = model.books.flatMap(b => b.words(code(b.sub)))
        v.zip(recon).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
      }.sum / rows.length
    }
    val coarse = mse(2)
    val fine = mse(16)
    assert(fine < coarse, s"k=16 mse $fine not below k=2 mse $coarse")
  }

  test("ragged vector column fails loudly at train time (silent mis-encode guard)") {
    import spark.implicits._
    val ragged = Seq(
      (0L, Array.fill(8)(1.0f)),
      (1L, Array.fill(4)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      PqIndex.train(ragged, "vec_id", "embedding", m = 2, k = 2, iters = 0)
    }
    assert(e.getMessage.contains("ragged"))
  }

  test("zero-norm vectors rank last in search, never first via NaN") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)),   // garbage row
      (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val model = PqIndex.train(vecs, "vec_id", "embedding", m = 2, k = 2, iters = 1)
    val enc = PqIndex.encode(vecs, "embedding", model)
    val q = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val out = PqIndex.search(enc, "vec_id", "embedding", model, q, topK = 4, shortlist = 4)
      .collect()
    assert(out.head.getLong(0) == 1L)                      // true best first
    assert(out.last.getLong(0) == 3L && out.last.getDouble(1) == -2.0)
    intercept[IllegalArgumentException] {
      PqIndex.search(enc, "vec_id", "embedding", model, new Array[Float](4), 1)
    }
  }

  test("dimension mismatch in adcScore fails loudly") {
    val model = PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 4, iters = 0)
    intercept[IllegalArgumentException] {
      PqIndex.adcScore(new Array[Float](7), model)
    }
  }

  test("filtered search pre-filters both passes and honors the predicate") {
    val model = PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val enc = PqIndex.encode(emb, "embedding", model)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    // predicate: even ids only
    val keep = emb.select(col("vec_id")).filter(col("vec_id") % 2 === 0)
    val got = PqIndex.searchFiltered(enc, "vec_id", "embedding", model, q,
      topK = 5, keep = keep).collect().map(_.getLong(0))
    assert(got.nonEmpty && got.forall(_ % 2 == 0), s"odd ids leaked: ${got.toSeq}")
    // keep = everything ≡ unfiltered search
    val all = PqIndex.searchFiltered(enc, "vec_id", "embedding", model, q,
      topK = 5, keep = emb.select(col("vec_id"))).collect().map(_.getLong(0))
    val plain = PqIndex.search(enc, "vec_id", "embedding", model, q, topK = 5)
      .collect().map(_.getLong(0))
    assert(all.toSeq == plain.toSeq)
    // a selective predicate still fills topK from the full match set
    // (pre-filter, not shortlist post-filter): ask for more survivors
    // than an unfiltered 5-row shortlist could contain
    val deep = PqIndex.searchFiltered(enc, "vec_id", "embedding", model, q,
      topK = 8, keep = keep, shortlist = 8).collect()
    assert(deep.length == 8, s"pre-filter must fill topK, got ${deep.length}")
    intercept[IllegalArgumentException] {
      PqIndex.searchFiltered(enc, "vec_id", "embedding", model, q, 5,
        keep.withColumnRenamed("vec_id", "id"))
    }
  }

  test("save/load round-trips the model; a fresh session searches identically") {
    val dir = java.nio.file.Files.createTempDirectory("pq_model").toString + "/m"
    val model = PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    PqIndex.save(spark, dir, model)
    val s2 = spark.newSession()
    val loaded = PqIndex.load(s2, dir)
    assert(loaded.m == model.m && loaded.subDim == model.subDim)
    assert(loaded.books.map(_.sub) == model.books.map(_.sub))
    assert(loaded.books.zip(model.books).forall { case (a, b) =>
      a.words.zip(b.words).forall { case (x, y) => x.sameElements(y) } },
      "loaded codebooks must be bit-identical to the trained ones")
    // search from the loaded model returns the same rows
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val enc = PqIndex.encode(emb.filter(col("vec_id") =!= 0), "embedding", model)
    val a = PqIndex.search(enc, "vec_id", "embedding", model, q, topK = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = PqIndex.search(PqIndex.encode(emb.filter(col("vec_id") =!= 0), "embedding", loaded),
        "vec_id", "embedding", loaded, q, topK = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
    assert(PqIndex.loadIfExists(spark, dir + "_nope").isEmpty)
  }
}
