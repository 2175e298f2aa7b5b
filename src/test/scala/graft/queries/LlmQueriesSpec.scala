package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Cross-validation for the engine-hash-based queries that have no
  * DuckDB oracle (SURVEY.md §2.3 note): MinHash-LSH and SimHash are
  * checked against the exact-algorithm q27 ground truth; ANN against
  * the brute-force q25.
  */
class LlmQueriesSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = LlmQueries.all(name)(spark, sf)

  test("minhash-LSH recovers every exact-Jaccard>=0.5 pair (100% recall here)") {
    val exact = run("q27_ngram_jaccard").select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = run("q28_minhash_lsh").select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dup pairs")
    // confirmation step means lsh ⊆ exact; recall assertion is the point
    assert(lsh == exact, s"LSH missed ${exact -- lsh}")
  }

  test("simhash pairs are symmetric-free, ordered, and hamming-bounded") {
    val rows = run("q29_simhash").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))        // da < db, no dup pairs
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 3)
    }
  }

  test("simhash 8-block config finds the same hamming<=3 pairs as the 4-block default") {
    // pigeonhole guarantee: any nBlocks >= 4 has full recall for
    // hamming <= 3, so the confirmed pair sets must be identical
    val p4 = run("q29_simhash").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p8 = LlmQueries.simhashPairs(spark, sf, nBlocks = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p8 == p4)
  }

  test("ANN returns <=k ranked candidates with valid cosines") {
    val ann = run("q31_ann_lsh").collect()
    assert(ann.length <= 5)
    val cosines = ann.map(_.getDouble(1))
    assert(cosines.sameElements(cosines.sorted.reverse))   // ranked desc
    assert(cosines.forall(c => c >= -1.0001 && c <= 1.0001))
  }

  test("brute-force top-k is the ANN upper bound") {
    val exact = run("q25_cosine_topk").collect().map(_.getDouble(1))
    val ann = run("q31_ann_lsh").collect().map(_.getDouble(1))
    // any ANN hit can't beat the true best
    if (ann.nonEmpty && exact.nonEmpty) assert(ann.max <= exact.max + 1e-9)
  }

  test("IVF ANN returns <=k ranked candidates bounded by brute force") {
    val ivf = run("q42_ann_ivf").collect()
    assert(ivf.nonEmpty && ivf.length <= 5)
    val cosines = ivf.map(_.getDouble(1))
    assert(cosines.sameElements(cosines.sorted.reverse))
    val exact = run("q25_cosine_topk").collect().map(_.getDouble(1))
    assert(cosines.max <= exact.max + 1e-9)
  }

  test("exact dedup keeps one row per distinct text") {
    val n = Tables.documents(spark, sf).count()
    val out = run("q24_exact_dedup")
    assert(out.agg(sum("n_copies")).head().getLong(0) == n)
  }
}
