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

  test("simhash64 is callable from SQL via the extension registration") {
    val got = spark.sql(
      "SELECT simhash64(array('the','a','value')) = simhash64(array('a','value','the','the')) AS eq"
    ).head().getBoolean(0)
    assert(got, "simhash must be order- and duplicate-insensitive")
  }

  test("LlmQueries.shingles (the production entry) equals the old chain on testdata") {
    val toks = Tables.tokens(col("text"))
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(LlmQueries.shingles(toks, 3).as("native"),
        hofShingles(toks, 3).as("interp"))
    assert(df.filter(not(col("native") === col("interp"))).count() == 0)
  }
}
