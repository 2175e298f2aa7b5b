package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftfns.VectorFunctions
import graft.SparkTestBase

class VectorExprSpec extends SparkTestBase {
  private def vecDf = {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = false)),
      StructField("b", ArrayType(FloatType, containsNull = false))))
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      Row(Seq(0.1f, 0.2f), Seq(0.3f, 0.4f)))), schema)
  }

  test("native dot product matches interpreted fold bit-for-bit") {
    val interp = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    val rows = vecDf.select(VectorFunctions.dot(col("a"), col("b")).as("native"),
        interp.as("interp")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))  // exact
    assert(rows.head.getDouble(0) == 32.0)
  }

  test("codegen path active (no fallback errors) and null-safe") {
    val withNull = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(null, Seq(1.0f)), Row(Seq(1.0f), Seq(2.0f)))),
      StructType(Seq(
        StructField("a", ArrayType(FloatType, containsNull = false), nullable = true),
        StructField("b", ArrayType(FloatType, containsNull = false), nullable = true))))
    val out = withNull.select(VectorFunctions.dot(col("a"), col("b")).as("d")).collect()
    assert(out(0).isNullAt(0) && out(1).getDouble(0) == 2.0)
  }

  test("HyperplaneSigs matches the composed per-plane dot derivation bit-for-bit") {
    val tables = 5; val bits = 7; val dim = 16
    val rng = new scala.util.Random(11)
    val planes = Array.fill(tables * bits * dim)(rng.nextGaussian().toFloat)
    val vrng = new scala.util.Random(12)
    val vecs = Seq.fill(40)(Seq.fill(dim)(vrng.nextFloat() * 2 - 1))
    val schema = StructType(Seq(
      StructField("v", ArrayType(FloatType, containsNull = false), nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.map(Row(_)) :+ Row(null)), schema)
    // composed oracle: one when(dot > 0, 1<<j) chain per (t, j)
    def planeLit(t: Int, j: Int) =
      typedLit((0 until dim).map(i => planes((t * bits + j) * dim + i)).toArray)
    def sig(t: Int) = (0 until bits).map { j =>
      when(VectorFunctions.dot(col("v"), planeLit(t, j)) > 0,
        shiftleft(lit(1), j)).otherwise(lit(0))
    }.reduce((x, y) => x.bitwiseOR(y))
    val rows = df.select(
      VectorFunctions.hyperplaneSigs(col("v"), planes, tables, bits, dim).as("fused"),
      array((0 until tables).map(sig): _*).as("composed")).collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(0))   // null vec -> null sigs
      else assert(r.getSeq[Int](0) == r.getSeq[Int](1))
    }
    assert(rows.count(_.isNullAt(0)) == 1)
    // short vectors use the min(dim, |v|) prefix — same as the driver probe
    val short = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq(1.0f, -2.0f)))), schema)
    val fused = short.select(
      VectorFunctions.hyperplaneSigs(col("v"), planes, tables, bits, dim)).head().getSeq[Int](0)
    val manual = (0 until tables).map { t =>
      (0 until bits).foldLeft(0) { (acc, j) =>
        val base = (t * bits + j) * dim
        val dot = planes(base).toDouble * 1.0f + planes(base + 1).toDouble * -2.0f
        if (dot > 0) acc | (1 << j) else acc
      }
    }
    assert(fused == manual)
  }

  test("dot_product and word_shingles registered for SQL") {
    org.apache.spark.sql.graftfns.VectorFunctions.register(spark)
    vecDf.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT dot_product(a, b) AS d FROM vecs ORDER BY d DESC").collect()
    assert(r.head.getDouble(0) == 32.0)
    val sh = spark.sql(
      "SELECT word_shingles(array('a','b','c'), 2) AS s").head().getSeq[String](0)
    assert(sh == Seq("a b", "b c"))
  }

  test("RewriteDotProduct upgrades the HOF fold to the codegen expression") {
    import org.apache.spark.sql.graftfns.{DotProduct, RewriteDotProduct}
    val interp = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RewriteDotProduct
    try {
      val df = vecDf.select(interp.as("d"))
      val rewritten = df.queryExecution.optimizedPlan.expressions
        .flatMap(_.collect { case e: DotProduct => e })
      assert(rewritten.nonEmpty, "rule did not fire on the canonical HOF fold")
      // bit-identical to the native expression
      val native = vecDf.select(VectorFunctions.dot(col("a"), col("b")).as("d"))
        .collect().map(_.getDouble(0)).toSeq
      assert(df.collect().map(_.getDouble(0)).toSeq == native)
    } finally spark.experimental.extraOptimizations = before
  }

  test("RewriteDotProduct leaves float-precision products alone") {
    import org.apache.spark.sql.graftfns.{DotProduct, RewriteDotProduct}
    // x * y on float lambda vars rounds each product to FLOAT — not the
    // double-product semantics DotProduct implements, so no rewrite
    val floatProd = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RewriteDotProduct
    try {
      val plan = vecDf.select(floatProd.as("d")).queryExecution.optimizedPlan
      assert(plan.expressions.flatMap(_.collect { case e: DotProduct => e }).isEmpty)
    } finally spark.experimental.extraOptimizations = before
  }

  test("length mismatch and null elements yield NULL in both forms") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true)),
      StructField("b", ArrayType(FloatType, containsNull = true))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 1.0f)),       // ragged
      Row(Seq(1.0f, null, 3.0f), Seq(1.0f, 1.0f, 1.0f)), // null element
      Row(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)))), schema)   // clean
    val interp = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    val out = df.select(VectorFunctions.dot(col("a"), col("b")).as("native"),
      interp.as("interp")).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).getDouble(0) == 11.0 && out(2).getDouble(1) == 11.0)
  }

  test("RosbagTables.connections reads the dimension") {
    val bag = graft.ros.etl.BagEtlMain.demoBag()
    val c = graft.ros.bag.RosbagTables.connections(spark, bag)
    assert(c.count() == 2)
    assert(c.schema.fieldNames.toSeq ==
      Seq("bag_path", "connection_id", "topic", "datatype", "md5sum", "msg_def",
        "callerid", "header"))
    // header map access (reference header->find model)
    assert(c.select(element_at(col("header"), "type")).head().getString(0)
      == "sensor_msgs/Imu")
  }
}
