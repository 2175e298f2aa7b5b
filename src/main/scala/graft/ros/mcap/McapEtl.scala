package graft.ros.mcap

import org.apache.spark.sql.SparkSession

/** MCAP → parquet-tables ETL: the reference's route-by-type dataflow
  * (O4, reference FlattenedRosWriter.cpp:273-289 + README.md:108-121)
  * over the ROS 2 container — a Messages spine, a Channels dimension,
  * and one flattened table per message schema, with the same
  * drift-namespacing contract as BagEtl: a schema name carrying more
  * than one definition across the input writes one table per variant
  * (`<table>__<md5prefix>`), never a silent mis-decode.
  *
  * Scale shape: every table is one declarative DataFrame write — the
  * spine and each typed table scan their own pruned column set (typed
  * scans plan only the files carrying the variant and decode only
  * matching channels), so Catalyst/DSv2 pushdown does the routing; no
  * driver-side message loop. Schemas whose encoding is not `ros2msg`
  * (arbitrary-encoded channels) stay queryable in the spine's raw
  * `data` column — same "you don't lose any data" retention as the
  * reference (README.md:106).
  */
object McapEtl {
  final case class Info(messages: Long, channels: Long, tables: Map[String, Long])

  /** Table name from a schema name — the reference's sanitize rule
    * (MessageTable.cpp:315) widened to the ROS 2 three-segment names.
    */
  def tableName(schemaName: String): String =
    schemaName.replaceAll("[^A-Za-z0-9]", "_")

  def run(spark: SparkSession, path: String, outDir: String): Info = {
    val spine = spark.read.format("mcap").load(path)
    // spine keeps metadata only — per-type tables carry the payloads,
    // and non-ros2msg channels keep their raw bytes there via the
    // spine read below
    spine.drop("data")
      .write.mode("errorifexists").parquet(s"$outDir/Messages.parquet")
    val channels = McapTables.channels(spark, path)
    channels.write.mode("errorifexists").parquet(s"$outDir/Channels.parquet")

    // (name, md5-of-schema-bytes) variants across all files; >1 md5 for
    // a name = drift -> per-variant namespaced tables
    val variants: Seq[(String, String)] = McapIO.resolveFiles(path)
      .flatMap(f => McapIO.scanIndex(f).schemas.values
        .filter(_.encoding == "ros2msg")
        .map(s => (s.name, McapTypedRead.md5hex(s.data))))
      .distinct
    val byName = variants.groupBy(_._1)
    val tables = variants.map { case (name, m) =>
      val drifted = byName(name).size > 1
      val table = tableName(name) + (if (drifted) s"__${m.take(8)}" else "")
      spark.read.format("mcap")
        .option("schema_name", name).option("schema_md5", m)
        .load(path)
        .write.mode("errorifexists").parquet(s"$outDir/$table.parquet")
      // row count from the written footers (metadata-only read)
      table -> spark.read.parquet(s"$outDir/$table.parquet").count()
    }.toMap
    Info(spark.read.parquet(s"$outDir/Messages.parquet").count(),
      channels.count(), tables)
  }
}
