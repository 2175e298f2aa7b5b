package graft.ros

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import graft.ros.mcap.{CdrCodec, McapFormat, Ros2Msg}
import graft.ros.db3.SqliteFormat
import graft.ros.bag.BagFormat

/** The "query enablement" thesis end-to-end through PLAIN SQL
  * (reference README.md:16-18): `CREATE TABLE fleet USING mcap` makes
  * a recording directory a first-class catalog table — `SELECT` over
  * it resolves through the same DSv2 provider, so filter pushdown,
  * catalog pruning and the metadata-aggregate pushdown all survive
  * the SQL path unchanged.
  */
class SqlCatalogSpec extends SparkTestBase {

  private val strDef = "string data"

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_sqlcat").toFile
    val r1 = MsgDefParser.parse("std_msgs/String", strDef)
    val r2 = Ros2Msg.bundle("std_msgs/msg/String", strDef)
    (0 until 3).foreach { f =>
      val conns = Seq(BagFormat.BagConnection(0, s"/bag$f", "std_msgs/String",
        "m", strDef, "c"))
      java.nio.file.Files.write(new java.io.File(d, s"r$f.bag").toPath,
        BagFormat.writeBag(conns, (0 until 4).map(i =>
          BagFormat.WriteMessage(0, 100 + i, 0,
            RosSchemaMapper.encode(r1, Seq(s"b$f-$i")))), messagesPerChunk = 2))
      java.nio.file.Files.write(new java.io.File(d, s"m$f.mcap").toPath,
        McapFormat.writeMcap(
          Seq(McapFormat.McapSchema(1, "std_msgs/msg/String", "ros2msg",
            strDef.getBytes("UTF-8"))),
          Seq(McapFormat.McapChannel(1, 1, s"/mcap$f", "cdr")),
          (0 until 4).map { i =>
            val t = 200000000000L + f * 1000000000L + i
            McapFormat.McapMessage(1, i.toLong, t, t,
              CdrCodec.encode(r2, Seq(s"m$f-$i")))
          }))
      java.nio.file.Files.write(new java.io.File(d, s"d$f.db3").toPath,
        SqliteFormat.writeDb(Seq(
          ("topics", "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT, serialization_format TEXT, offered_qos_profiles TEXT)",
            Seq(Seq[Any](null, s"/db3$f", "std_msgs/msg/String", "cdr", ""))),
          ("messages", "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, timestamp INTEGER, data BLOB)",
            (0 until 4).map(i => Seq[Any](null, 1L,
              300000000000L + f * 1000000000L + i,
              CdrCodec.encode(r2, Seq(s"d$f-$i"))))))))
    }
    d.getAbsolutePath
  }

  private def planOf(sql: String): String = {
    val df = spark.sql(sql)
    df.collect() // adaptive plans print the real tree only once finalized
    df.queryExecution.executedPlan.toString
  }

  test("CREATE TABLE USING mcap: SELECT resolves, filter pushdown + catalog pruning survive SQL") {
    spark.sql(s"CREATE TABLE fleet_mcap USING mcap OPTIONS (path '$dir')")
    try {
      assert(spark.sql("SELECT count(*) AS n FROM fleet_mcap")
        .head().getLong(0) === 12L)
      // topic filter: pushed into the scan AND catalog-pruned to the
      // one carrying file
      val df = spark.sql(
        "SELECT topic, log_time FROM fleet_mcap WHERE topic = '/mcap1'")
      assert(df.collect().length === 4)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("pushedFilters=[EqualTo(topic,/mcap1)")
        || plan.contains("EqualTo(topic,/mcap1)"), plan)
      val scanned = df.rdd.partitions.length
      val all = spark.table("fleet_mcap").rdd.partitions.length
      assert(scanned < all, s"catalog pruning must shrink the SQL scan: $scanned vs $all")
      // metadata-aggregate pushdown survives the SQL path
      val aggPlan = planOf(
        "SELECT topic, count(*) AS n FROM fleet_mcap GROUP BY topic")
      assert(aggPlan.contains("metadataAgg=true"), aggPlan)
    } finally spark.sql("DROP TABLE fleet_mcap")
  }

  test("CREATE TABLE USING rosbag and db3: the other containers are SQL tables too") {
    spark.sql(s"CREATE TABLE fleet_bag USING rosbag OPTIONS (path '$dir')")
    spark.sql(s"CREATE TABLE fleet_db3 USING db3 OPTIONS (path '$dir')")
    try {
      assert(spark.sql("SELECT count(*) AS n FROM fleet_bag")
        .head().getLong(0) === 12L)
      assert(spark.sql(
        "SELECT count(*) AS n FROM fleet_bag WHERE topic = '/bag0'")
        .head().getLong(0) === 4L)
      assert(planOf("SELECT topic, count(*) AS n FROM fleet_bag GROUP BY topic")
        .contains("metadataAgg=true"))
      assert(spark.sql("SELECT count(*) AS n FROM fleet_db3")
        .head().getLong(0) === 12L)
      assert(spark.sql(
        "SELECT max(timestamp) AS m FROM fleet_db3 WHERE topic = '/db32'")
        .head().getLong(0) === 300000000000L + 2000000003L)
      assert(planOf("SELECT topic, count(*) AS n FROM fleet_db3 GROUP BY topic")
        .contains("metadataAgg=true"))
      // a join between two container SQL tables plans like any other
      assert(spark.sql(
        """SELECT b.topic AS bt, d.topic AS dt
          |FROM fleet_bag b JOIN fleet_db3 d
          |  ON substr(b.topic, 5, 1) = substr(d.topic, 5, 1)
          |WHERE b.topic = '/bag1'""".stripMargin).collect().length === 16)
    } finally {
      spark.sql("DROP TABLE fleet_bag")
      spark.sql("DROP TABLE fleet_db3")
    }
  }

  test("INSERT INTO / INSERT OVERWRITE a container SQL table: the write half through plain SQL") {
    val out = java.nio.file.Files.createTempDirectory("graft_sqlins").toString + "/export"
    spark.sql(s"CREATE TABLE fleet_ins USING mcap OPTIONS (path '$out')")
    try {
      graft.ros.mcap.McapExport.prepare(
        spark.range(8).toDF("id"),
        topic = concat(lit("/t"), col("id") % 2),
        logTimeNs = col("id") * lit(1000L) + lit(1700000000000000000L),
        data = encode(concat(lit("p-"), col("id")), "UTF-8"),
        schemaName = lit("graft/T")).createOrReplaceTempView("ins_src")
      spark.sql("INSERT INTO fleet_ins SELECT * FROM ins_src")
      assert(spark.sql("SELECT count(*) AS n FROM fleet_ins").head().getLong(0) === 8L)
      // append accumulates
      spark.sql("INSERT INTO fleet_ins SELECT * FROM ins_src WHERE topic = '/t0'")
      assert(spark.sql("SELECT count(*) AS n FROM fleet_ins").head().getLong(0) === 12L)
      // overwrite truncates to the new rows only
      spark.sql("INSERT OVERWRITE fleet_ins SELECT * FROM ins_src WHERE topic = '/t1'")
      assert(spark.sql("SELECT topic, count(*) AS n FROM fleet_ins GROUP BY topic")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        === Map("/t1" -> 4L))
    } finally spark.sql("DROP TABLE fleet_ins")
  }

  test("typed SQL table: schema_name option decodes payload columns through SQL") {
    // the fixture is pre-Humble-shaped (no message_definitions table),
    // so the definition arrives through the SQL OPTIONS passthrough
    spark.sql(s"CREATE TABLE fleet_typed USING db3 OPTIONS (" +
      s"path '$dir', schema_name 'std_msgs/msg/String', " +
      s"schema_text '$strDef')")
    try {
      val rows = spark.sql(
        "SELECT data_field FROM fleet_typed WHERE topic = '/db30' ORDER BY msg_id")
        .collect().map(_.getString(0)).toSeq
      assert(rows === (0 until 4).map(i => s"d0-$i"))
    } finally spark.sql("DROP TABLE fleet_typed")
  }
}
