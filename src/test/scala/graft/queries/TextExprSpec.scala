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

  test("LlmQueries.shingles (the production entry) equals the old chain on testdata") {
    val toks = Tables.tokens(col("text"))
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(LlmQueries.shingles(toks, 3).as("native"),
        hofShingles(toks, 3).as("interp"))
    assert(df.filter(not(col("native") === col("interp"))).count() == 0)
  }
}
