package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SubstringDedup vs a brute-force in-memory reference, plus the
  * hashed-key scale mode pinned equal to exact mode.
  */
class SubstringDedupSpec extends SparkTestBase {

  private def toksDf(docs: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        filter(split(lower(col("text")), "\\s+"), x => x =!= lit(""))
          .as("toks"))
  }

  /** Brute-force duplicated spans: every L-window string counted
    * across the corpus, positions of duplicated windows merged into
    * maximal covered runs per doc.
    */
  private def bruteSpans(docs: Seq[(Long, String)], l: Int,
                         minCount: Int): Map[Long, Seq[(Int, Int)]] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val wins = for {
      (id, ts) <- toks
      p <- 0 to ts.length - l
    } yield (id, p, ts.slice(p, p + l).mkString(" "))
    val counts = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val dupPos = wins.filter(w => counts(w._3) >= minCount)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    dupPos.map { case (id, ps) =>
      val spans = ps.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p <= (e - l + 1) + l => (s, math.max(e, p + l - 1)) :: rest
        case (acc, p) => (p, p + l - 1) :: acc
      }.reverse
      id -> spans
    }
  }

  private val corpus = Seq[(Long, String)](
    // 0 and 1 share an 8-token run ("the quick brown fox jumps over the dog")
    0L -> "the quick brown fox jumps over the dog and then it went home to sleep",
    1L -> "once upon a time the quick brown fox jumps over the dog said nobody ever",
    // 2 repeats a 6-token phrase internally (within-doc duplication)
    2L -> "alpha beta gamma delta epsilon zeta eta theta alpha beta gamma delta epsilon zeta iota kappa",
    // 3 is clean
    3L -> "completely unique words that appear nowhere else in this tiny corpus at all honestly",
    // 4 shorter than the window
    4L -> "short doc",
    // 5 duplicates 0 entirely (exact dup -> one full-cover span)
    5L -> "the quick brown fox jumps over the dog and then it went home to sleep")

  test("spans match brute force (L=4)") {
    val l = 4
    val got = SubstringDedup.spans(toksDf(corpus), "doc_id", "toks", l)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    val want = bruteSpans(corpus, l, 2).filter(_._2.nonEmpty)
    assert(got === want)
  }

  test("profile: clean and short docs present with zeros; fractions consistent") {
    val l = 4
    val df = SubstringDedup.profile(toksDf(corpus), "doc_id", "toks", l)
      .orderBy("doc_id").collect()
    assert(df.length === corpus.length)
    val byId = df.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // doc 3 (clean) and doc 4 (shorter than window) have zero spans
    assert(byId(3L)._2 === 0L && byId(3L)._3 === 0L && byId(3L)._4 === 0.0)
    assert(byId(4L)._2 === 0L && byId(4L)._3 === 0L)
    // docs 0 and 5 are exact duplicates: every window duplicated ->
    // one span covering the whole doc, fraction 1.0
    for (id <- Seq(0L, 5L)) {
      assert(byId(id)._2 === 1L, s"doc $id span count")
      assert(byId(id)._3 === byId(id)._1, s"doc $id full cover")
      assert(byId(id)._4 === 1.0)
    }
    // within-doc repetition (doc 2) is detected without any cross-doc pair
    assert(byId(2L)._3 > 0L)
    // fraction = dup_tokens / n_tokens for every row
    df.foreach { r =>
      assert(r.getDouble(4) === r.getLong(3).toDouble / r.getLong(1))
    }
  }

  test("profile: an empty token array is a clean doc (dup_frac 0.0, not NaN)") {
    val r = SubstringDedup.profile(toksDf(corpus :+ (9L -> "")),
        "doc_id", "toks", 4)
      .filter(col("doc_id") === 9L).collect()
    assert(r.length === 1)
    assert(r.head.getLong(1) === 0L, "n_tokens")
    assert(r.head.getDouble(4) === 0.0, "dup_frac must be 0.0, not 0/0 NaN")
  }

  test("hashed scale mode is row-identical to exact mode") {
    val l = 4
    val exact = SubstringDedup.profile(toksDf(corpus), "doc_id", "toks", l)
      .orderBy("doc_id").collect().toSeq
    val hashed = SubstringDedup
      .profile(toksDf(corpus), "doc_id", "toks", l, hashed = true)
      .orderBy("doc_id").collect().toSeq
    assert(hashed === exact)
  }

  test("adjacent-but-not-overlapping windows merge into one span") {
    // two duplicated windows at positions p and p+L exactly: coverage
    // [p, p+L-1] and [p+L, p+2L-1] is contiguous -> ONE span
    val l = 3
    val run = "a b c x y z"            // 6 tokens: windows at 0 and 3
    val docs = Seq[(Long, String)](
      10L -> s"$run filler1 filler2",
      11L -> s"other tokens first $run")
    val spans = SubstringDedup.spans(toksDf(docs), "doc_id", "toks", l)
      .filter(col("doc_id") === 10L).collect()
      .map(r => (r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(spans === Seq((0, 5)))
  }

  test("minCount raises the duplication bar") {
    val l = 4
    // the 0/1-shared run occurs twice, the 0/5 full dup occurs twice;
    // with minCount=3 only windows occurring 3+ times survive — the
    // 8-token run shared by docs 0, 1 AND 5
    val got = SubstringDedup
      .spans(toksDf(corpus), "doc_id", "toks", l, minCount = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    val want = bruteSpans(corpus, l, 3).filter(_._2.nonEmpty)
      .flatMap { case (id, sp) => sp.map(s => (id, s._1, s._2)) }.toSeq
    assert(got.sorted === want.toSeq.sorted)
  }

  /** Brute-force strip: removable = duplicated window occurrences
    * minus (keepFirst) each window's corpus-first (id, pos); cleaned
    * doc = tokens outside the union of removable window coverages.
    */
  private def bruteStrip(docs: Seq[(Long, String)], l: Int, minCount: Int,
                         keepFirst: Boolean): Map[Long, Seq[String]] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val wins = for {
      (id, ts) <- toks
      p <- 0 to ts.length - l
    } yield (id, p, ts.slice(p, p + l).mkString(" "))
    val counts = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val dup = wins.filter(w => counts(w._3) >= minCount)
    val firstOf = dup.groupBy(_._3).view
      .mapValues(_.minBy(o => (o._1, o._2))).toMap
    val removable =
      if (keepFirst) dup.filter(o => firstOf(o._3) != o) else dup
    val cov = removable.groupBy(_._1).view
      .mapValues(_.flatMap(o => o._2 until o._2 + l).toSet).toMap
    toks.map { case (id, ts) =>
      id -> ts.zipWithIndex.collect {
        case (t, i) if !cov.getOrElse(id, Set.empty[Int]).contains(i) => t
      }
    }.toMap
  }

  // corpus plus a doc ENDING in the shared run (span-at-end) and an
  // empty doc
  private val stripCorpus = corpus ++ Seq[(Long, String)](
    6L -> "xyzzy plugh the quick brown fox jumps over the dog",
    7L -> "")

  private def runStrip(l: Int, minCount: Int = 2, hashed: Boolean = false,
                       keepFirst: Boolean = true): Map[Long, Seq[String]] =
    SubstringDedup.strip(toksDf(stripCorpus), "doc_id", "toks", l,
        minCount, hashed, keepFirst)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap

  test("strip matches brute force (keep-first and strip-all, L=4)") {
    val l = 4
    assert(runStrip(l) === bruteStrip(stripCorpus, l, 2, keepFirst = true))
    assert(runStrip(l, keepFirst = false) ===
      bruteStrip(stripCorpus, l, 2, keepFirst = false))
  }

  test("strip: span-at-0 keeper, span-at-end, whole-doc, within-doc keep-first") {
    val got = runStrip(4)
    def t(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    // doc 0 carries the corpus-FIRST occurrence of the shared run at
    // position 0 — keep-first leaves it whole (span-at-0 exemption)
    assert(got(0L) === t(stripCorpus.head._2))
    // doc 5 duplicates doc 0 entirely: every window non-first, the
    // merged span covers the WHOLE doc -> empty
    assert(got(5L) === Seq.empty)
    // doc 6 ends in the shared run: the strip span reaches the last
    // token, the unique prefix survives
    assert(got(6L) === Seq("xyzzy", "plugh"))
    // doc 2 repeats a phrase internally: the FIRST repeat survives,
    // the second strips (within-doc keep-first); unique tail survives
    val d2 = t(stripCorpus(2)._2)
    assert(got(2L) === (d2.take(8) ++ d2.drop(14)))
    // doc 1 strips the shared run from its middle
    val d1 = t(stripCorpus(1)._2)
    assert(got(1L) === (d1.take(4) ++ d1.drop(12)))
    // clean, short, and empty docs come back untouched
    assert(got(3L) === t(stripCorpus(3)._2))
    assert(got(4L) === t(stripCorpus(4)._2))
    assert(got(7L) === Seq.empty)
  }

  test("hashed strip is row-identical to exact strip") {
    assert(runStrip(4, hashed = true) === runStrip(4))
    assert(runStrip(4, hashed = true, keepFirst = false) ===
      runStrip(4, keepFirst = false))
  }

  test("caller columns colliding with working names are rejected-safe") {
    // a caller id column literally named like a working column must not
    // corrupt grouping — the operator only references __ssd_* columns
    // it SELECTed itself, so a __ssd_pos input column is simply ignored
    val docs = toksDf(Seq(0L -> "a b c d a b c d", 1L -> "a b c d x y z w"))
      .withColumn("__ssd_pos", lit(999))
    val got = SubstringDedup.spans(docs, "doc_id", "toks", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got.nonEmpty)
    assert(got.forall(_._3 < 8))
  }
}
