package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftfns.TextFunctions
import graft.SparkTestBase

/** WordShingles (native codegen) vs the interpreted HOF chain it
  * replaced — must be indistinguishable on every input shape.
  */
class TextExprSpec extends SparkTestBase {

  /** the pre-round-3 interpreted implementation, kept as the test oracle */
  private def hofShingles(toks: org.apache.spark.sql.Column, n: Int) =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))))
      .otherwise(array().cast("array<string>"))

  private val schema = StructType(Seq(
    StructField("toks", ArrayType(StringType, containsNull = true), nullable = true)))

  test("matches the interpreted chain on random token arrays (n=1..4)") {
    val rng = new scala.util.Random(7)
    val alphabet = Seq("a", "bb", "query", "", "ñü", "the", "a b", "x")
    val rows = (0 until 300).map { _ =>
      val len = rng.nextInt(9)
      Row(Seq.fill(len)(alphabet(rng.nextInt(alphabet.size))))
    } ++ Seq(
      Row(null),                        // null array
      Row(Seq[String]()),               // empty
      Row(Seq("solo")),
      Row(Seq(null, "a", null, "b")),   // null elements (concat_ws skips)
      Row(Seq("d", "d", "d", "d")))     // heavy duplication
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    for (n <- 1 to 4) {
      val out = df.select(
        coalesce(TextFunctions.shingles(col("toks"), n),
          array().cast("array<string>")).as("native"),
        hofShingles(col("toks"), n).as("interp")).collect()
      out.zipWithIndex.foreach { case (r, i) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n row=$i: native=${r.getSeq[String](0)} interp=${r.getSeq[String](1)}")
      }
    }
  }

  test("SimHash64 matches the exploded xxhash64 bit-sum derivation") {
    // the pre-round-4 shape, kept as the test oracle: explode distinct
    // tokens, xxhash64 each, 64 bit-count sums, bit b set iff 2*S_b > N
    val rng = new scala.util.Random(13)
    val alphabet = Seq("a", "bb", "query", "", "ñü", "the", "a b", "x",
      "join", "scan", "row", "value")
    val rows = (0 until 300).map { i =>
      val len = rng.nextInt(12)
      Row(i.toLong, Seq.fill(len)(alphabet(rng.nextInt(alphabet.size))))
    } ++ Seq(
      Row(1000L, null),                      // null array -> null simhash
      Row(1001L, Seq[String]()),             // empty -> null
      Row(1002L, Seq(null, null)),           // only nulls -> null
      Row(1003L, Seq("solo")),
      Row(1004L, Seq(null, "a", null, "a"))) // dup + nulls -> hash of {a}
    val schema2 = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("toks", ArrayType(StringType, containsNull = true), nullable = true)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema2)
    val native = df
      .select(col("doc_id"), TextFunctions.simhash64(col("toks")).as("sh"))
      .filter(col("sh").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bitSums = (0 until 64).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(1)).as(s"s$b")) :+ count(lit(1)).as("n")
    val oracle = df
      .select(col("doc_id"), explode_outer(array_distinct(col("toks"))).as("t"))
      .filter(col("t").isNotNull)
      .withColumn("h", xxhash64(col("t")))
      .groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .withColumn("sh",
        (0 until 64).map(b =>
          when(col(s"s$b") * 2 > col("n"), shiftleft(lit(1L), b)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)))
      .select(col("doc_id"), col("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == oracle)
  }

  test("minhash_sig is callable from SQL and is order/duplicate-insensitive") {
    val got = spark.sql(
      "SELECT minhash_sig(array('a','b','c'), 16) = minhash_sig(array('c','a','b','b'), 16) AS eq"
    ).head().getBoolean(0)
    assert(got, "minhash signature must be a set function of the shingles")
  }

  test("simhash64 is callable from SQL via the extension registration") {
    val got = spark.sql(
      "SELECT simhash64(array('the','a','value')) = simhash64(array('a','value','the','the')) AS eq"
    ).head().getBoolean(0)
    assert(got, "simhash must be order- and duplicate-insensitive")
  }

  test("shinglesAll (no-dedup mode) matches the interpreted transform chain") {
    // all-occurrence n-grams in position order: the q64 BPE-pair emit
    val rng = new scala.util.Random(17)
    val alphabet = Seq("a", "bb", "query", "", "ñü", "the", "a b", "x")
    val rows = (0 until 300).map { _ =>
      val len = rng.nextInt(9)
      Row(Seq.fill(len)(alphabet(rng.nextInt(alphabet.size))))
    } ++ Seq(Row(null), Row(Seq[String]()), Row(Seq("solo")),
      Row(Seq(null, "a", null, "b")), Row(Seq("d", "d", "d", "d")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    for (n <- 1 to 3) {
      val interp = when(size(col("toks")) >= n,
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", (0 until n).map(k => element_at(col("toks"), i + k + 1)): _*)))
        .otherwise(array().cast("array<string>"))
      val out = df.select(
        coalesce(TextFunctions.shinglesAll(col("toks"), n),
          array().cast("array<string>")).as("native"),
        interp.as("interp")).collect()
      out.zipWithIndex.foreach { case (r, i) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n row=$i: native=${r.getSeq[String](0)} interp=${r.getSeq[String](1)}")
      }
    }
  }

  test("MinHashSig matches the per-seed array_min(transform) derivation") {
    // the pre-round-4 interpreted scheme, kept as the test oracle
    val k = 16
    def interp(sh: org.apache.spark.sql.Column) =
      array((0 until k).map(i =>
        array_min(transform(sh, x => xxhash64(lit(i), x)))): _*)
    val rng = new scala.util.Random(23)
    val alphabet = Seq("a b c", "bb x", "query scan", "", "ñü 日", "the a", "z")
    val rows = (0 until 300).map { _ =>
      val len = rng.nextInt(10)
      Row(Seq.fill(len)(alphabet(rng.nextInt(alphabet.size))))
    } ++ Seq(Row(null), Row(Seq[String]()),       // null -> null, empty -> all-null sig
      Row(Seq(null, "a")), Row(Seq("solo")))      // null shingle -> bare seed candidate
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val out = df.select(
      TextFunctions.minhashSig(col("toks"), k).as("native"),
      interp(col("toks")).as("interp")).collect()
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[Any](0) == r.getSeq[Any](1),
        s"row=$i: native=${r.getSeq[Any](0)} interp=${r.getSeq[Any](1)}")
    }
  }

  /** the pre-round-4 interpreted q63 derivation, kept as the test oracle */
  private def hofWinnow(toks: org.apache.spark.sql.Column, k: Int, w: Int) = {
    def polyHash(str: org.apache.spark.sql.Column) =
      aggregate(transform(split(str, ""), c => ascii(c).cast("long")),
        lit(0L), (acc, c) => pmod(acc * 31 + c, lit(1000000007L)))
    val grams = when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))
    val hs = transform(grams, g => polyHash(g))
    when(size(hs) >= w,
      array_distinct(transform(sequence(lit(1), size(hs) - w + 1),
        i => array_min(slice(hs, i, lit(w))))))
      .otherwise(array().cast("array<long>"))
  }

  test("PolyHashes matches the interpreted per-element polynomial chain") {
    val rng = new scala.util.Random(31)
    val alphabet = Seq("a", "bb", "query word", "", "ñü", "héllo", "日本語", "😀ok")
    val rows = (0 until 200).map { _ =>
      Row(Seq.fill(rng.nextInt(9))(alphabet(rng.nextInt(alphabet.size))))
    } ++ Seq(Row(null), Row(Seq[String]()))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    def interp(arr: org.apache.spark.sql.Column) =
      transform(arr, s =>
        aggregate(transform(split(s, ""), c => ascii(c).cast("long")),
          lit(0L), (acc, c) => pmod(acc * 31 + c, lit(1000000007L))))
    val out = df.select(TextFunctions.polyHashes(col("toks")).as("native"),
      interp(col("toks")).as("interp")).collect()
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"row=$i: native=${r.getSeq[Long](0)} interp=${r.getSeq[Long](1)}")
    }
  }

  test("WinnowFingerprints matches the interpreted gram/hash/window chain") {
    val rng = new scala.util.Random(29)
    // non-ASCII entries exercise the code-point hash (ascii == ord ==
    // codePointAt(0), incl. a supplementary-plane char)
    val alphabet = Seq("a", "bb", "query", "", "ñü", "the", "a b", "x",
      "héllo", "日本語", "😀ok")
    val rows = (0 until 300).map { _ =>
      val len = rng.nextInt(14)
      Row(Seq.fill(len)(alphabet(rng.nextInt(alphabet.size))))
    } ++ Seq(
      Row(null),                          // null array -> null
      Row(Seq[String]()),                 // empty -> empty
      Row(Seq("a", "b")),                 // < k tokens -> empty
      Row(Seq("a", "b", "c", "d", "e")),  // exactly w grams boundary
      Row(Seq(null, "a", null, "b", null, "c", "d")), // null tokens
      Row(Seq.fill(9)("d")))              // all-duplicate grams
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    for ((k, w) <- Seq((3, 4), (2, 3), (1, 2), (4, 4))) {
      val out = df.select(
        coalesce(TextFunctions.winnowFingerprints(col("toks"), k, w),
          array().cast("array<long>")).as("native"),
        hofWinnow(col("toks"), k, w).as("interp")).collect()
      out.zipWithIndex.foreach { case (r, i) =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"k=$k w=$w row=$i: native=${r.getSeq[Long](0)} interp=${r.getSeq[Long](1)}")
      }
    }
  }

  test("winnow_fingerprints is callable from SQL and guarantees shared-run coverage") {
    // two texts sharing a run of >= w+k-1 = 6 tokens must share a fingerprint
    val got = spark.sql(
      """SELECT size(array_intersect(
        |  winnow_fingerprints(array('p','q','the','quick','brown','fox','jumped','high'), 3, 4),
        |  winnow_fingerprints(array('z','the','quick','brown','fox','jumped','away','now'), 3, 4))) > 0
        |  AS shared""".stripMargin).head().getBoolean(0)
    assert(got, "a shared >= w+k-1 token run must leave a shared fingerprint")
  }

  test("LlmQueries.shingles (the production entry) equals the old chain on testdata") {
    val toks = Tables.tokens(col("text"))
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(LlmQueries.shingles(toks, 3).as("native"),
        hofShingles(toks, 3).as("interp"))
    assert(df.filter(not(col("native") === col("interp"))).count() == 0)
  }
}
