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

  test("dot_product registered for SQL") {
    org.apache.spark.sql.graftfns.VectorFunctions.register(spark)
    vecDf.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT dot_product(a, b) AS d FROM vecs ORDER BY d DESC").collect()
    assert(r.head.getDouble(0) == 32.0)
  }

  test("RosbagTables.connections reads the dimension") {
    val bag = graft.ros.etl.BagEtlMain.demoBag()
    val c = graft.ros.bag.RosbagTables.connections(spark, bag)
    assert(c.count() == 2)
    assert(c.schema.fieldNames.toSeq ==
      Seq("connection_id", "topic", "datatype", "md5sum", "msg_def", "callerid", "header"))
    // header map access (reference header->find model)
    assert(c.select(element_at(col("header"), "type")).head().getString(0)
      == "sensor_msgs/Imu")
  }
}
