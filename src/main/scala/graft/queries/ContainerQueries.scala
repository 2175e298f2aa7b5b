package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ros.mcap._

/** Container-source queries under the DRIVER'S oracle gate: the MCAP
  * (q76), rosbag2-sqlite (q77) and rosbag1 (q78) source → typed decode
  * → aggregation paths, checked against DuckDB.
  *
  * The oracle can only see the testdata parquet tables, so the gate is
  * a ROUND-TRIP: the first 1000 `events` rows (by event_id, a
  * deterministic slice both engines can name) are encoded into an MCAP
  * fixture — even ids on a protobuf channel, odd ids on a ros2msg/CDR
  * channel, both under the engine's own wire encoders — and the query
  * reads them back through the typed container source and aggregates.
  * Equality with DuckDB aggregating the same slice straight off
  * `events` proves the full chain: wire encode → container write →
  * chunked scan → schema-dispatched typed decode → columns, for BOTH
  * typed encodings at once (and the per-encoding channel routing, via
  * the topic-split count).
  *
  * Scale note: this is a correctness gate over a fixture, not a scale
  * probe — the fixture is bounded (1000 rows, built once per sf dir
  * and reused) while the container source itself is the scale surface
  * (per-chunk partitions, pushdown; BagSpec/McapSpec pin those).
  */
object ContainerQueries {
  import Tables._
  import ProtoDescriptor._

  private val PbName = "graft.test.Event"
  private val RosName = "graft_msgs/msg/Event"
  private val RosDef =
    "int64 event_id\nint64 ts_us\nint64 user_id\nstring event_type\nfloat64 value\nstring props"
  // ROS 1 twin (two-segment name; same field list — ROS1 msg text).
  // The md5 is the GENUINE genmsg checksum, as real recorders write —
  // the sinks preserve each file's own (md5, definition) truth per
  // connection, so a junk fixture md5 would split typed reads into
  // two variants after a transcode.
  private val Ros1Name = "graft_msgs/Event"
  private lazy val Ros1Md5 = graft.ros.RosMd5.compute(Ros1Name, RosDef)

  /** The SAME type as generated OMG IDL — q77's db3 fixture stores
    * THIS form, so the ros2idl parser sits inside the oracle equality
    * (newer recordings ship IDL, not msg text).
    */
  private val RosIdlDef =
    """module graft_msgs { module msg { struct Event {
      |  int64 event_id;
      |  int64 ts_us;
      |  int64 user_id;
      |  string event_type;
      |  double value;
      |  string props;
      |}; }; };""".stripMargin

  private def fds: Array[Byte] = buildFds("graft.test", Seq("Event" -> Seq(
    ProtoField("event_id", 1, repeated = false, TInt64, ""),
    ProtoField("ts_us", 2, repeated = false, TInt64, ""),
    ProtoField("user_id", 3, repeated = false, TInt64, ""),
    ProtoField("event_type", 4, repeated = false, TString, ""),
    ProtoField("value", 5, repeated = false, TDouble, ""),
    ProtoField("props", 6, repeated = false, TString, ""))))

  /** Cache key for a fixture derived from `d`'s events table: the dir
    * PLUS the events parquet's (length, mtime) — regenerated testdata
    * under the same path must rebuild the fixture, or the oracle gate
    * compares a stale container against fresh parquet.
    */
  private def cacheKey(d: String): String = {
    val ev = new java.io.File(d, "events.parquet")
    // "v2": fixture-format version salt — bump when the fixture's
    // content changes for the same testdata (e.g. q77's move to
    // ros2idl definitions), or stale cached containers leak into the
    // oracle gate
    md5Key(s"v2:$d:${ev.length}:${ev.lastModified}")
  }

  private def md5Key(sig: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)

  /** Build (once per sf-dir content) the two-channel MCAP fixture and
    * return its path. A done-marker + rename makes concurrent/crashed
    * builds safe (a half-written file is never visible under the final
    * name).
    */
  private def fixture(s: SparkSession, d: String): String = synchronized {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_container_" + cacheKey(d))
    dir.mkdirs()
    val f = new java.io.File(dir, "events.mcap")
    val done = new java.io.File(dir, "_built")
    if (!done.exists()) {
      val rows = events(s, d).orderBy(col("event_id")).limit(1000)
        .select(col("event_id"), us(col("ts")).as("ts_us"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .collect()
      val set = parseSet(fds)
      val rosBundle = Ros2Msg.bundle(RosName, RosDef)
      val schemas = Seq(
        McapFormat.McapSchema(1, PbName, "protobuf", fds),
        McapFormat.McapSchema(2, RosName, "ros2msg", RosDef.getBytes("UTF-8")))
      val channels = Seq(
        McapFormat.McapChannel(1, 1, "/events_pb", "protobuf"),
        McapFormat.McapChannel(2, 2, "/events_ros", "cdr"))
      val msgs = rows.map { r =>
        val vals = Seq[Any](r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getString(5))
        val even = r.getLong(0) % 2 == 0
        McapFormat.McapMessage(
          channelId = if (even) 1 else 2,
          sequence = r.getLong(0),
          logTime = r.getLong(1) * 1000L, // micros → nanos (bounded: testdata era)
          publishTime = r.getLong(1) * 1000L,
          data = if (even) ProtoCodec.encode(set, PbName, vals)
                 else CdrCodec.encode(rosBundle, vals))
      }.toSeq
      val tmp = new java.io.File(dir, "events.mcap.tmp")
      val out = new java.io.FileOutputStream(tmp)
      try out.write(McapFormat.writeMcap(schemas, channels, msgs, "zstd"))
      finally out.close()
      require(tmp.renameTo(f) || f.exists(), s"fixture rename failed: $f")
      done.createNewFile()
      ()
    }
    f.getAbsolutePath
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q76 — container round-trip, CHECKED: events → MCAP (protobuf +
    // CDR channels) → typed source → per-type aggregation. cnt_pb
    // counts via the container TOPIC, so channel routing (not just
    // payload fidelity) is inside the oracle equality.
    "q76_container_roundtrip" -> ((s, d) => {
      val path = fixture(s, d)
      def rd(name: String) = s.read.format("mcap")
        .option("path", path).option("schema_name", name).load()
        .select(col("topic"), col("event_id"), col("ts_us"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      rd(PbName).unionByName(rd(RosName))
        .groupBy(col("event_type")).agg(
          count(lit(1)).as("cnt"),
          count(when(col("topic") === "/events_pb", 1)).as("cnt_pb"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"),
          max(col("ts_us")).as("max_ts_us"),
          round(sum(col("value").cast("decimal(28,10)")), 2).cast("double")
            .as("sum_value"),
          sum(length(col("props")).cast("long")).as("props_chars"))
        .orderBy(col("event_type"))
    }),

    // Q77 — db3 round-trip, CHECKED: the same slice through the
    // rosbag2 sqlite container instead — engine-written SQLite file
    // (b-tree pages, overflow chains), read back via the db3 typed
    // source. The stored definition is the generated-IDL form
    // (ros2idl), so the IDL parser is inside the equality. max_ts_ns
    // reads the CONTAINER's timestamp column, so rosbag2's
    // nanosecond-time convention is inside the oracle equality.
    "q77_db3_roundtrip" -> ((s, d) => {
      val path = db3Fixture(s, d)
      s.read.format("db3").option("path", path)
        .option("schema_name", RosName).load()
        .groupBy(col("event_type")).agg(
          count(lit(1)).as("cnt"),
          max(col("timestamp")).as("max_ts_ns"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"),
          sum(col("user_id")).as("sum_uid"),
          round(sum(col("value").cast("decimal(28,10)")), 2).cast("double")
            .as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // Q78 — rosbag1 round-trip, CHECKED: the same slice through the
    // reference's OWN container — engine-written .bag (bz2 chunks,
    // ROS1 message serialization), read back via the rosbag typed
    // source. connection routing sits inside the equality (cnt_even
    // counts via connection_id: even ids on conn 0, odd on conn 1),
    // and max_ts_us reads the bag's RECEIPT time (time_sec/time_nsec),
    // so the ROS1 time convention is inside the oracle equality too.
    "q78_rosbag_roundtrip" -> ((s, d) => {
      val path = bagFixture(s, d)
      s.read.format("rosbag").option("datatype", Ros1Name).load(path)
        .groupBy(col("event_type")).agg(
          count(lit(1)).as("cnt"),
          count(when(col("connection_id") === 0, 1)).as("cnt_even"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"),
          max(col("time_sec").cast("long") * lit(1000000L) +
            expr("time_nsec div 1000").cast("long")).as("max_ts_us"),
          round(sum(col("value").cast("decimal(28,10)")), 2).cast("double")
            .as("sum_value"),
          sum(length(col("props")).cast("long")).as("props_chars"))
        .orderBy(col("event_type"))
    }),

    // Q79 — mixed-container dataset read, CHECKED: one directory
    // holding the q76/q77/q78 fixtures (all three container formats),
    // read through MixedRead.spine's per-extension dispatch. Counts,
    // per-container topic cardinality (the channel/connection/topic
    // dimensions) and the nanosecond min/max timestamps under each
    // container's own time convention all sit inside the DuckDB
    // equality (each fixture stamps message time from the same ts_us,
    // so all three converge on epoch_us(ts)*1000).
    "q79_mixed_spine" -> ((s, d) => {
      val dir = mixedFixture(s, d)
      graft.ros.MixedRead.spine(s, dir)
        .groupBy(col("container")).agg(
          count(lit(1)).as("cnt"),
          countDistinct(col("topic")).as("n_topics"),
          min(col("timestamp")).as("min_ts_ns"),
          max(col("timestamp")).as("max_ts_ns"))
        .orderBy(col("container"))
    }),

    // Q80 — metadata-count aggregation, CHECKED: the "rosbag info"
    // query class over the q76/q78 fixtures. groupBy(topic).count()
    // over the bag reads the chunk-info per-connection counts and over
    // the mcap file the summary Statistics record — the aggregate
    // pushdown path (no chunk body read) sits inside the DuckDB
    // equality, since the fixtures route even event ids to one
    // topic/channel and odd to the other.
    "q80_metadata_counts" -> ((s, d) => {
      val bag = bagFixture(s, d)
      val mc = fixture(s, d)
      val a = s.read.format("rosbag").load(bag)
        .groupBy(col("topic")).agg(count(lit(1)).as("cnt"))
        .withColumn("container", lit("rosbag"))
      val b = s.read.format("mcap").load(mc)
        .groupBy(col("topic")).agg(count(lit(1)).as("cnt"))
        .withColumn("container", lit("mcap"))
      a.unionByName(b).select(col("container"), col("topic"), col("cnt"))
        .orderBy(col("container"), col("topic"))
    }),

    // Q82 — metadata-range aggregation, CHECKED: the full "rosbag
    // info" scalar block (count + min/max timestamp) over all three
    // container fixtures, answered from each container's OWN metadata
    // — rosbag chunk-info start/end times, the MCAP Statistics
    // record's message_start/end_time, and the db3 leaf-cell prefix
    // walk (count + timestamp, no blob bytes) — inside the DuckDB
    // equality. Each container reports in its own time unit (rosbag
    // whole seconds, the ROS 2 containers nanoseconds), so the unit
    // conversions sit inside the gate too. McapSpec/BagSpec/Db3Spec
    // pin that these plans really ARE the metadata path
    // (metadataAgg=true) and that refusal cases fall back.
    "q82_metadata_ranges" -> ((s, d) => {
      val bag = bagFixture(s, d)
      val mc = fixture(s, d)
      val db = db3Fixture(s, d)
      val a = s.read.format("rosbag").load(bag)
        .agg(count(lit(1)).as("cnt"),
          min(col("time_sec")).cast("long").as("min_v"),
          max(col("time_sec")).cast("long").as("max_v"))
        .withColumn("container", lit("rosbag"))
      val b = s.read.format("mcap").load(mc)
        .agg(count(lit(1)).as("cnt"),
          min(col("log_time")).as("min_v"),
          max(col("log_time")).as("max_v"))
        .withColumn("container", lit("mcap"))
      val c = s.read.format("db3").option("path", db).load()
        .agg(count(lit(1)).as("cnt"),
          min(col("timestamp")).as("min_v"),
          max(col("timestamp")).as("max_v"))
        .withColumn("container", lit("db3"))
      a.unionByName(b).unionByName(c)
        .select(col("container"), col("cnt"), col("min_v"), col("max_v"))
        .orderBy(col("container"))
    }),

    // Q83 — GROUPED metadata aggregation over db3, CHECKED: the
    // reference's own per-connection stats TODO (rosbag2parquet
    // .cpp:22-24 — per connection: min/max timestamp, total messages)
    // answered from pure container metadata on the one format where
    // grouped ranges are exact with no write-order assumption — the
    // b-tree leaf-prefix walk reads (topic_id, timestamp) together
    // (SqliteFormat.groupedCountMinMax), no blob byte touched. The
    // fixture splits even/odd event ids across two topics, so real
    // groups (counts AND disjoint-step ranges) sit inside the DuckDB
    // equality; Db3Spec pins the plan (metadataAgg=true) and the
    // fallback cases (filters, typed reads, non-catalog groupings).
    "q83_db3_grouped_info" -> ((s, d) => {
      val db = db3Fixture(s, d)
      s.read.format("db3").option("path", db).load()
        .groupBy(col("topic")).agg(
          count(lit(1)).as("cnt"),
          min(col("timestamp")).as("min_ts_ns"),
          max(col("timestamp")).as("max_ts_ns"))
        .orderBy(col("topic"))
    }),

    // Q85 — the SQL catalog surface, CHECKED: `CREATE TABLE ... USING
    // mcap` makes the recording a first-class catalog table and the
    // whole "rosbag info" class runs through PLAIN spark.sql — the
    // reference README's query-enablement thesis (README.md:16-18)
    // end-to-end with zero DataFrame code. The grouped count rides the
    // metadata-aggregate pushdown exactly like q80 (SqlCatalogSpec
    // pins metadataAgg=true through the SQL path); the per-topic
    // even/odd routing sits inside the DuckDB equality.
    // warc joins the catalog gate (round 16): `USING warc` is pure
    // SQL-surface — the crawl rows union in under the same output
    // shape, with doc-id ranges standing in the *_ts_ns columns
    "q85_sql_catalog" -> ((s, d) => {
      val path = fixture(s, d)
      val crawl = warcFixture(s, d)
      s.sql("DROP TABLE IF EXISTS graft_fleet_sql")
      s.sql(s"CREATE TABLE graft_fleet_sql USING mcap OPTIONS (path '$path')")
      s.sql("DROP TABLE IF EXISTS graft_crawl_sql")
      s.sql(s"CREATE TABLE graft_crawl_sql USING warc OPTIONS (path '$crawl')")
      s.sql("""SELECT topic, cnt, min_ts_ns, max_ts_ns FROM (
              |  SELECT topic, count(*) AS cnt,
              |         min(log_time) AS min_ts_ns, max(log_time) AS max_ts_ns
              |  FROM graft_fleet_sql GROUP BY topic
              |  UNION ALL
              |  SELECT concat('/crawl/',
              |           regexp_extract(target_uri, 'https://([^.]+)[.]', 1))
              |           AS topic,
              |         count(*) AS cnt,
              |         min(cast(regexp_extract(target_uri, '/doc/([0-9]+)$', 1)
              |           AS BIGINT)) AS min_ts_ns,
              |         max(cast(regexp_extract(target_uri, '/doc/([0-9]+)$', 1)
              |           AS BIGINT)) AS max_ts_ns
              |  FROM graft_crawl_sql
              |  WHERE warc_type = 'response' AND http_status = 200
              |  GROUP BY 1
              |) ORDER BY topic""".stripMargin)
    }),

    // Q86 — the EXPORT direction, CHECKED: events → McapExport.prepare
    // → the DSv2 mcap SINK (one incrementally-written container file
    // per partition, `rosbag filter`'s re-emit half — the direction the
    // reference leaves to external tooling) → read back through the
    // mcap source → per-topic aggregation against DuckDB on the raw
    // parquet. Topic routing (one channel per event_type), nanosecond
    // log_time stamping, sequence preservation and payload byte
    // fidelity all sit inside the equality; McapSinkSpec covers the
    // writer mechanics (chunking, summary statistics, overwrite,
    // typed re-read via schema_defs_from).
    "q86_mcap_export" -> ((s, d) => {
      val out = exportFixture(s, d)
      s.read.format("mcap").load(out)
        .groupBy(col("topic")).agg(
          count(lit(1)).as("cnt"),
          min(col("sequence")).as("min_id"),
          max(col("sequence")).as("max_id"),
          min(col("log_time")).as("min_ts_ns"),
          max(col("log_time")).as("max_ts_ns"),
          sum(length(col("data")).cast("long")).as("data_bytes"))
        .orderBy(col("topic"))
    }),

    // Q87 — the bag + db3 EXPORT directions, CHECKED: the same slice
    // through the other two sinks (`df.write.format("rosbag")` — one
    // locally-built, header-patched bag per partition; `df.write
    // .format("db3")` — rolled engine-written sqlite files) and back
    // through their sources, per-topic counts + each container's own
    // time convention (bag receipt seconds, db3 nanoseconds) + payload
    // byte fidelity inside the DuckDB equality. BagSinkSpec/
    // Db3SinkSpec cover writer mechanics (chunking, index back-patch,
    // rolling, typed re-read, overwrite).
    "q87_export_roundtrip" -> ((s, d) => {
      val (bagDir, db3Dir) = exportFixture2(s, d)
      val a = s.read.format("rosbag").load(bagDir)
        .groupBy(col("topic")).agg(
          count(lit(1)).as("cnt"),
          max(col("time_sec").cast("long")).as("max_ts"),
          sum(length(col("data")).cast("long")).as("data_bytes"))
        .withColumn("container", lit("rosbag"))
      val b = s.read.format("db3").load(db3Dir)
        .groupBy(col("topic")).agg(
          count(lit(1)).as("cnt"),
          max(col("timestamp")).as("max_ts"),
          sum(length(col("data")).cast("long")).as("data_bytes"))
        .withColumn("container", lit("db3"))
      a.unionByName(b)
        .select(col("container"), col("topic"), col("cnt"), col("max_ts"),
          col("data_bytes"))
        .orderBy(col("container"), col("topic"))
    }),

    // Q88 — fleet-scale CONVERT, CHECKED: the q79 mixed directory
    // (all three container formats) normalized into ONE mcap archive
    // through `Convert.run` (MixedRead.spine → prepare → the mcap
    // sink), read back, per-topic counts and ns timestamps against
    // DuckDB on the raw parquet. The bag and db3 fixtures share topic
    // names, so the convert MERGES them (2× the even/odd counts on
    // /events_even|odd) while the mcap fixture's /events_pb|ros pass
    // through — topic fidelity, cross-dialect merge, and each source's
    // time-convention normalization all sit inside the equality.
    "q88_convert_mixed" -> ((s, d) => {
      val out = convertFixture(s, d)
      s.read.format("mcap").load(out)
        .groupBy(col("topic")).agg(
          count(lit(1)).as("cnt"),
          min(col("log_time")).as("min_ts_ns"),
          max(col("log_time")).as("max_ts_ns"))
        .orderBy(col("topic"))
    }),

    // Q89 — convert carries DEFINITIONS, CHECKED: the q88 archive's
    // ros2-dialect channels decode under the TYPED mcap reader with
    // no manual defs options — `Convert.run` auto-harvested the
    // definitions from the source containers (db3
    // message_definitions rows as ros2idl, the mcap fixture's own
    // ros2msg Schema record) and embedded them as Schema records in
    // the output. /events_even + /events_odd are the db3-sourced
    // rows (IDL-defined CDR), /events_ros the mcap-sourced ones; the
    // bag-sourced ros1 channels and the protobuf channel carry other
    // schema names and stay out of this typed read. Decoded field
    // values (ids, user ids, doubles) sit inside the DuckDB equality,
    // so definition fidelity — not just presence — is gated.
    "q89_convert_typed" -> ((s, d) => {
      val out = convertFixture(s, d)
      s.read.format("mcap").option("path", out)
        .option("schema_name", RosName).load()
        .groupBy(col("topic")).agg(
          count(lit(1)).as("cnt"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"),
          sum(col("user_id")).as("sum_uid"),
          round(sum(col("value").cast("decimal(28,10)")), 2).cast("double")
            .as("sum_value"))
        .orderBy(col("topic"))
    }),

    // Q90 — time-range query over the MIXED spine, CHECKED: the
    // upper-half window per container. The mcap/db3 branches push the
    // `timestamp` bound natively; the rosbag branch's timestamp is
    // COMPUTED (sec*1e9 + nsec), so this row gates the
    // SplitTimeBounds optimizer rule — the derived raw `time_sec`
    // conjunct is what lets the bag source prune chunks (plan-level
    // pruning is pinned in MixedReadSpec; the VALUE equality with
    // DuckDB is gated here). The threshold is computed driver-side
    // with the same integer arithmetic DuckDB's `//` applies, so the
    // boundary row lands identically on both sides.
    "q90_mixed_timerange" -> ((s, d) => {
      val dir = mixedFixture(s, d)
      def spine = graft.ros.MixedRead.spine(s, dir)
      val bounds = spine.agg(min(col("timestamp")), max(col("timestamp"))).head()
      val lo = bounds.getLong(0) + (bounds.getLong(1) - bounds.getLong(0)) / 2
      spine.filter(col("timestamp") >= lo)
        .groupBy(col("container")).agg(
          count(lit(1)).as("cnt"),
          min(col("timestamp")).as("min_ts_ns"),
          max(col("timestamp")).as("max_ts_ns"))
        .orderBy(col("container"))
    }),

    // Q91 — typed CROSS-DIALECT transcode, CHECKED: the mixed
    // directory converted with `transcode=auto`, so the bag's ros1
    // rows re-encode as CDR under the TRANSLATED ros2msg definition
    // (decode(ros1) → encode(cdr), graft_msgs/Event renamed to the
    // ros2 namespace). The bag's /events_even|odd rows now join the
    // db3-sourced ones under ONE typed read of the renamed type —
    // those topics double while /events_ros (mcap-sourced, already
    // cdr) stays — and the bag rows' decoded FIELD VALUES (ids, user
    // ids, doubles) sit inside the DuckDB equality, so re-encode
    // fidelity across the dialect boundary — not just row routing —
    // is what this row gates (the q89 pattern pointed across
    // dialects).
    "q91_transcode_typed" -> ((s, d) => {
      val out = transcodeFixture(s, d)
      s.read.format("mcap").option("path", out)
        .option("schema_name", RosName).load()
        .groupBy(col("topic")).agg(
          count(lit(1)).as("cnt"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"),
          sum(col("user_id")).as("sum_uid"),
          round(sum(col("value").cast("decimal(28,10)")), 2).cast("double")
            .as("sum_value"))
        .orderBy(col("topic"))
    }),

    // Q92 — the REVERSE transcode, CHECKED: the mixed directory
    // (protobuf channel filtered out — no ros1 rendering exists for
    // it) converted INTO a rosbag archive with `transcode=auto`, so
    // the db3/mcap CDR rows re-encode as ros1 serialization under the
    // reverse-translated definition (renamed graft_msgs/msg/Event →
    // graft_msgs/Event, connection records carrying the GENUINE
    // genmsg md5). One typed bag read then decodes all three eras —
    // the same doubled-topic shape as q91, pointed the other way
    // across the dialect boundary.
    "q92_transcode_rosbag" -> ((s, d) => {
      val out = transcodeBagFixture(s, d)
      // the typed bag read exposes (bag_path, connection_id) + payload
      // columns; topic comes from the connections DIMENSION via the
      // O11 broadcast join
      val typed = s.read.format("rosbag").option("bags", out + "/*.bag")
        .option("datatype", Ros1Name).load()
      val conns = broadcast(graft.ros.bag.RosbagTables
        .connections(s, out + "/*.bag")
        .select(col("bag_path"), col("connection_id"), col("topic")))
      typed.join(conns, Seq("bag_path", "connection_id"))
        .groupBy(col("topic")).agg(
          count(lit(1)).as("cnt"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"),
          sum(col("user_id")).as("sum_uid"),
          round(sum(col("value").cast("decimal(28,10)")), 2).cast("double")
            .as("sum_value"))
        .orderBy(col("topic"))
    }),

    // Q93 — the PROTOBUF crossing, CHECKED: the same transcoded
    // archive as q91, read under the RENDERED ros2msg name
    // (graft.test.Event's FileDescriptorSet → graft_test/msg/Event).
    // The /events_pb rows were protobuf on the wire in the source;
    // `transcode=auto` decoded them through the descriptor walk and
    // re-encoded as CDR, embedding the rendered definition as the
    // archive's own Schema record — so this typed read needs no
    // manual options and the decoded FIELD VALUES (even event ids,
    // user ids, decimal sums) sit inside the DuckDB equality. With
    // all three dialects now crossing, q91's fixture is a genuinely
    // all-cdr ros2-profile archive.
    "q93_transcode_proto" -> ((s, d) => {
      val out = transcodeFixture(s, d)
      s.read.format("mcap").option("path", out)
        .option("schema_name", "graft_test/msg/Event").load()
        .groupBy(col("topic")).agg(
          count(lit(1)).as("cnt"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"),
          sum(col("user_id")).as("sum_uid"),
          round(sum(col("value").cast("decimal(28,10)")), 2).cast("double")
            .as("sum_value"))
        .orderBy(col("topic"))
    }),

    // Q94 — WARC crawl-shard ingestion, CHECKED: the documents table
    // round-trips through the web-archive wire format (ISO 28500,
    // Common Crawl's layout — member-per-record gzip, HTTP response
    // blocks) and back through the `warc` DSv2 source. The per-source
    // aggregates run over columns the SOURCE derives (the http split's
    // body bytes, status-filtered), with source and doc id re-derived
    // from the crawl URI — so framing, the gzip member stream, the
    // http split AND payload byte fidelity all sit inside the DuckDB
    // equality. sum_bytes compares the binary payload length against
    // DuckDB's strlen(text): UTF-8 octets on both sides.
    "q94_warc_ingest" -> ((s, d) => {
      val dir = warcFixture(s, d)
      s.read.format("warc").load(dir)
        .filter(col("warc_type") === "response" && col("http_status") === 200)
        .withColumn("source",
          regexp_extract(col("target_uri"), "https://([^.]+)\\.", 1))
        .withColumn("doc_id",
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long"))
        .groupBy(col("source")).agg(
          count(lit(1)).as("cnt"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"),
          sum(length(col("payload")).cast("long")).as("sum_bytes"))
        .orderBy(col("source"))
    }),

    // Q95 — crawl payload → clean text, CHECKED per document: the
    // corpus HTML-wrapped (escaped text in <p> tags amid
    // title/style/script/comment noise, entity-encoded punctuation,
    // three charsets) through the engine's WARC writer, read back via
    // format("warc"), and the native codegen'd html_text expression
    // (charset decode from http_content_type, comment/script/style/tag
    // strip, entity decode, RE2-\s collapse) must recover each
    // document's text BIT-EXACTLY up to whitespace collapse — gated
    // with a per-doc md5 against DuckDB computing the same collapse on
    // the pre-wrap text. The step between q94 (ingestion) and every
    // text operator consuming documents.text.
    "q95_html_extract" -> ((s, d) => {
      val dir = htmlWarcFixture(s, d)
      val text = org.apache.spark.sql.graftfns.HtmlText.htmlText(
        col("payload"), col("http_content_type"))
      s.read.format("warc").load(dir)
        .filter(col("warc_type") === "response" && col("http_status") === 200)
        .withColumn("doc_id",
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long"))
        .withColumn("text", text)
        .select(col("doc_id"),
          md5(col("text").cast("binary")).as("text_md5"),
          length(col("text")).cast("long").as("nchars"))
        .orderBy(col("doc_id"))
    }),

    // Q96 — the matrix's LAST transcode cell, CHECKED: the mixed
    // fixture's PROTOBUF channel (graft.test.Event, even event ids)
    // normalized into a `.bag` archive via transcode=auto's composed
    // proto→ros2→ros1 lowering. The typed rosbag read under the
    // RENDERED ros1 name decodes genuine packed-ros1 payloads written
    // against a genuine genmsg md5 connection — field values (even
    // ids, user ids, decimal sums) all inside the DuckDB equality.
    // Mirrors q92's read shape (typed read + O11 connections
    // broadcast join) pointed at the proto-sourced connection.
    "q96_transcode_proto_rosbag" -> ((s, d) => {
      val out = transcodeBagFixture2(s, d)
      val typed = s.read.format("rosbag").option("bags", out + "/*.bag")
        .option("datatype", "graft_test/Event").load()
      val conns = broadcast(graft.ros.bag.RosbagTables
        .connections(s, out + "/*.bag")
        .select(col("bag_path"), col("connection_id"), col("topic")))
      typed.join(conns, Seq("bag_path", "connection_id"))
        .groupBy(col("topic")).agg(
          count(lit(1)).as("cnt"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"),
          sum(col("user_id")).as("sum_uid"),
          round(sum(col("value").cast("decimal(28,10)")), 2).cast("double")
            .as("sum_value"))
        .orderBy(col("topic"))
    }),

    // Q97 — the full DDS-XTypes encapsulation matrix in ONE file,
    // CHECKED: each message encodes under the flavor its event_id
    // selects (XCDR1, PL_CDR mutable, XCDR2 final, XCDR2 delimited,
    // PL_CDR2 mutable), and the aggregation groups BY that slot — a
    // flavor decoding wrong (member headers, DHEADERs, origin resets,
    // 4-vs-8 alignment) breaks exactly its group's sums against
    // DuckDB. Per-message flavor dispatch is inside the equality too:
    // one channel, five encapsulation ids.
    "q97_mutable_cdr" -> ((s, d) => {
      val path = mutableFixture(s, d)
      s.read.format("mcap").option("path", path)
        .option("schema_name", RosName).load()
        .groupBy(pmod(col("event_id"), lit(5)).as("flavor_slot"))
        .agg(
          count(lit(1)).as("cnt"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"),
          sum(col("user_id")).as("sum_uid"),
          round(sum(col("value").cast("decimal(28,10)")), 2).cast("double")
            .as("sum_value"),
          sum(length(col("props")).cast("long")).as("props_chars"))
        .orderBy(col("flavor_slot"))
    }),

    // Q98 — the crawl CURATION pipeline end-to-end, CHECKED: WARC
    // shards (with a third "recrawl" shard of genuine `revisit`
    // records — body elided, payload digest + refers-to, as a
    // deduplicating crawler stores re-fetches) → format("warc")
    // ingestion → REVISIT RESOLUTION (the crawl-native exact-dedup
    // signal: revisit counts join the response spine on the sha1
    // digest the crawler itself computed, so duplicates never pay
    // extraction) → html_text once per STORED page → word-count
    // quality gate → exact dedup on the extracted text's md5 weighted
    // by fetch multiplicity → per-source corpus stats. This is the
    // q94→q95→q24 composition as ONE dataflow: the oracle recomputes
    // total/unique/char counts straight off `documents` with the same
    // duplication rule, so ingestion fidelity, digest attribution,
    // extraction inversion, the quality predicate and the dedup key
    // all sit inside a single DuckDB equality. Scale shape: the
    // revisit side partial-aggs to (digest, count) before its join,
    // one shuffle on the text-dedup key, then a partial-aggregable
    // rollup — no self-join, no window over the corpus.
    "q98_crawl_pipeline" -> ((s, d) => {
      val dir = dupCrawlFixture(s, d)
      val text = org.apache.spark.sql.graftfns.HtmlText.htmlText(
        col("payload"), col("http_content_type"))
      val crawl = s.read.format("warc").load(dir)
      graft.warc.RevisitResolve.resolve(crawl)
        .filter(col("http_status") === 200)
        .withColumn("source",
          regexp_extract(col("target_uri"), "https://([^.]+)\\.", 1))
        .withColumn("t", text)
        // the ≥5-word quality gate applies PER GROUP (copies of one
        // md5 share one text), evaluated as an aggregate and filtered
        // ABOVE the first groupBy — a direct row filter on `t` would
        // be pushed below the projection and inline html_text into
        // the Filter condition, decoding every payload twice (the
        // collapsed-filter anti-pattern in the verify gotchas); this
        // shape keeps extraction at one evaluation per record for the
        // cost of shuffling rejected groups' 48-byte agg rows
        .groupBy(col("source"), md5(col("t").cast("binary")).as("text_md5"))
        .agg(sum(col("copies")).as("copies"),
          min(length(col("t")).cast("long")).as("nchars"),
          min(size(split(col("t"), " "))).as("words"))
        .filter(col("words") >= lit(5)) // quality: ≥5 words
        .groupBy(col("source")).agg(
          sum(col("copies")).as("docs_total"),
          count(lit(1)).as("docs_unique"),
          sum(col("nchars")).as("uniq_chars"))
        .orderBy(col("source"))
    }),

    // Q99 — the crawl path's WIRE-DECODE matrix, CHECKED per document:
    // the corpus HTML-wrapped and written with each doc's slot picking
    // its HTTP wire form — identity, Content-Encoding: gzip,
    // Transfer-Encoding: chunked, chunked-over-gzip, and a
    // header-less-charset page (charset only in <meta>, or only a
    // BOM for text ISO-8859-1 can't carry). format("warc") must
    // reverse the declared encodings (de-chunk, then inflate) and
    // html_text must run the HTML5 sniff (BOM > meta > utf-8) before
    // each document's text comes back bit-exactly (q95's md5 gate).
    // enc_left pins "fully decoded" INSIDE the oracle equality: any
    // leftover chain on any row breaks the NULL column.
    "q99_warc_encoded" -> ((s, d) => {
      val dir = encodedWarcFixture(s, d)
      val text = org.apache.spark.sql.graftfns.HtmlText.htmlText(
        col("payload"), col("http_content_type"))
      s.read.format("warc").load(dir)
        .filter(col("warc_type") === "response" && col("http_status") === 200)
        .withColumn("doc_id",
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long"))
        .withColumn("text", text)
        .select(col("doc_id"),
          md5(col("text").cast("binary")).as("text_md5"),
          length(col("text")).cast("long").as("nchars"),
          col("http_content_encoding").as("enc_left"))
        .orderBy(col("doc_id"))
    }),

    // Q102 — WET export round trip, CHECKED per document: the q98
    // crawl (responses + genuine revisits) → RevisitResolve →
    // html_text → `conversion` records (extracted text, text/plain,
    // WARC-Refers-To naming the source record — the Common Crawl WET
    // sidecar shape) written through the DSv2 warc SINK (two
    // partitions — the multi-shard layout; member-per-record gzip the
    // strict reader verifies member-by-member) → read BACK via
    // format("warc") → per-doc md5 + char count of the conversion
    // payload must equal DuckDB's collapse of the original text. The
    // sink's framing, record rendering, refers-to headers, gzip
    // members, commit protocol AND the reader all sit inside one
    // equality — the export direction of the crawl pipeline (the
    // mcap/rosbag/db3 sinks' q86/q87 gate, pointed at the fourth
    // container).
    "q102_wet_export" -> ((s, d) => {
      val wet = wetFixture(s, d)
      s.read.format("warc").load(wet)
        .filter(col("warc_type") === "conversion")
        .withColumn("doc_id",
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long"))
        .withColumn("t", decode(col("payload"), "UTF-8"))
        .select(col("doc_id"),
          md5(col("payload")).as("text_md5"),
          length(col("t")).cast("long").as("nchars"),
          // every conversion must point at its source record — a
          // boolean inside the oracle equality, not a side assert
          col("refers_to").startsWith("<urn:uuid:doc-").as("linked"))
        .orderBy(col("doc_id"))
    }),

    // Q103 — CDX random-access lookup, CHECKED per addressed
    // document: the corpus written as HTTP-response WARC shards
    // through the SINK (which publishes a sorted CDXJ sidecar per
    // shard as it writes — exact compressed member byte ranges), then
    // a 10-url lookup resolved THROUGH the index: `option("cdx")`
    // plans (offset, length) ranges off the sidecars at plan time, so
    // only the addressed shards — and only the addressed gzip members
    // within them — are read. Each fetched member's payload must
    // md5-match DuckDB's md5 over the original text, so the sink's
    // byte accounting, the sidecar round-trip, the SURT keying, the
    // range fetch AND the standalone member decode all sit inside one
    // DuckDB equality (a stale offset or a mis-framed member breaks
    // its row). The sequential-scan ≡ indexed-read row equality is
    // pinned separately in WarcCdxSpec.
    "q103_cdx_lookup" -> ((s, d) => {
      val dir = cdxFixture(s, d)
      val urls = (0 until 10).map(k =>
        s"https://crawl.example.com/doc/${10 * k + 3}")
      s.read.format("warc").option("cdx", "true").load(dir)
        .filter(col("target_uri").isin(urls: _*) &&
          col("http_status") === 200)
        .withColumn("doc_id",
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long"))
        .select(col("doc_id"), md5(col("payload")).as("text_md5"),
          length(decode(col("payload"), "UTF-8")).cast("long").as("nchars"))
        .orderBy(col("doc_id"))
    }),

    // Q104 — URL canonicalization matrix, CHECKED per document: each
    // doc_id%8 slot constructs a deterministically MESSY url (mixed
    // case, default port, www, dot-segments + non-default port on a
    // multi-part ccTLD, tracking params + unsorted query, userinfo +
    // FQDN dot + fragment, ftp default port, bare-IP host, opaque
    // mailto) and the native url_canon / url_host / url_domain /
    // url_surt expressions normalize it. The oracle states each
    // slot's expected canonical/host/registered-domain/SURT form as a
    // literal CASE over (source, doc_id), so every canonicalization
    // rule — including the PSL-subset multi-part suffix, the IP
    // passthrough, the www-fold and the NULLs for opaque urls — sits
    // inside one DuckDB equality. Map-only: one projection, no
    // shuffle before the verify sort.
    "q104_url_canon" -> ((s, d) => {
      import org.apache.spark.sql.graftfns.UrlFns._
      val url = slotUrl
      documents(s, d).select(col("doc_id"),
          urlCanon(url).as("canon"), urlHost(url).as("host"),
          urlDomain(url).as("domain"), urlSurt(url).as("surt"))
        .orderBy(col("doc_id"))
    }),

    // Q105 — per-DOMAIN corpus stats and mixture shares (the q67
    // shape keyed by registered domain instead of source): every
    // production crawl pipeline balances by domain BEFORE text-level
    // dedup, and the registered domain — not the host — is the
    // balancing key (a site's subdomains must pool). The q104 slot
    // urls give 61 hosts that COLLAPSE to three domains (+ the
    // opaque slot's NULLs, filtered), so the host→domain fold is
    // inside the equality, not just the arithmetic. Scale shape: one
    // partial-aggregable shuffle on the domain key; the total rides a
    // broadcast of the one-row aggregate.
    "q105_domain_stats" -> ((s, d) => {
      import org.apache.spark.sql.graftfns.UrlFns._
      val perDom = documents(s, d)
        .select(urlDomain(slotUrl).as("domain"),
          urlHost(slotUrl).as("host"), col("n_chars"))
        .filter(col("domain").isNotNull)
        .groupBy(col("domain")).agg(
          count(lit(1)).as("docs"),
          countDistinct(col("host")).as("hosts"),
          sum(col("n_chars")).as("chars"))
      val tot = perDom.agg(sum(col("docs")).as("tot_docs"))
      perDom.crossJoin(broadcast(tot))
        .select(col("domain"), col("docs"), col("hosts"), col("chars"),
          rk(col("docs").cast("double") / col("tot_docs"), 6).as("share"))
        .orderBy(col("domain"))
    }))

  /** q103's fixture: every document an HTTP-response WARC record
    * (uri `https://crawl.example.com/doc/<doc_id>`, body = text
    * UTF-8) across three member-gzipped shards written through the
    * DSv2 SINK with its default cdx sidecars — the indexed-lookup
    * target. Keyed on the documents parquet (length, mtime) + a
    * version salt.
    */
  private def cdxFixture(s: SparkSession, d: String): String = synchronized {
    val docs = new java.io.File(d, "documents.parquet")
    val key = md5Key(s"cdxv1:$d:${docs.length}:${docs.lastModified}")
    publishStaged("graft_cdx_" + key) { stage =>
      graft.warc.WarcExport.prepareHttpResponse(
          documents(s, d).select(col("doc_id"), col("text")),
          uri = concat(lit("https://crawl.example.com/doc/"),
            col("doc_id").cast("string")),
          body = encode(col("text"), "UTF-8"),
          httpContentType = lit("text/plain; charset=utf-8"))
        .repartition(3)
        .write.format("warc").mode("overwrite")
        .save(new java.io.File(stage, "crawl").getAbsolutePath)
    } + "/crawl"
  }

  /** The q104/q105 messy-url construction — doc_id%8 picks the
    * canonicalization rule the slot exercises; mirrored as literal
    * expected forms in the oracle SQL.
    */
  private def slotUrl: org.apache.spark.sql.Column = {
    val slot = pmod(col("doc_id"), lit(8))
    val id = col("doc_id").cast("string")
    when(slot === 0,
        concat(lit("https://"), col("source"), lit(".example.com/doc/"), id))
      .when(slot === 1,
        concat(lit("HTTPS://WWW."), col("source"),
          lit(".Example.COM:443/doc/"), id))
      .when(slot === 2,
        concat(lit("http://"), col("source"),
          lit(".example.co.uk:8080/a/./b/../doc/"), id))
      .when(slot === 3,
        concat(lit("https://"), col("source"), lit(".example.com/doc/"), id,
          lit("?utm_source=x&b=2&a=1")))
      .when(slot === 4,
        concat(lit("https://user:pw@"), col("source"),
          lit(".example.com./doc/"), id, lit("#frag")))
      .when(slot === 5,
        concat(lit("ftp://"), col("source"), lit(".example.com:21/doc/"), id))
      .when(slot === 6, concat(lit("https://192.168.0.1/doc/"), id))
      .otherwise(concat(lit("mailto:"), col("source"), lit("@example.com")))
  }

  /** q97's fixture: the events slice on one cdr channel, each message
    * encoded under the encapsulation flavor its event_id selects —
    * all five DDS-XTypes flavors (XCDR1 0x01, PL_CDR 0x03, XCDR2
    * final 0x07, XCDR2 delimited 0x09, PL_CDR2 0x0b) interleaved in
    * one file, as a fleet mid-rmw-upgrade would record them.
    */
  private def mutableFixture(s: SparkSession, d: String): String = synchronized {
    // own versioned salt (not the shared cacheKey "v2"): a change to
    // the mutable ENCODER's wire output for the same testdata must
    // invalidate exactly this fixture — bump "mutablev1" with it
    val ev = new java.io.File(d, "events.parquet")
    val key = md5Key(s"mutablev1:$d:${ev.length}:${ev.lastModified}")
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_mutable_" + key)
    dir.mkdirs()
    val f = new java.io.File(dir, "events_mutable.mcap")
    val done = new java.io.File(dir, "_built")
    if (!done.exists()) {
      val rows = events(s, d).orderBy(col("event_id")).limit(1000)
        .select(col("event_id"), us(col("ts")).as("ts_us"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .collect()
      val rosBundle = Ros2Msg.bundle(RosName, RosDef)
      import CdrCodec.{Xcdr1, Xcdr1Mutable, Xcdr2Final, Xcdr2Delimited, Xcdr2Mutable}
      val flavors = Array(Xcdr1, Xcdr1Mutable, Xcdr2Final, Xcdr2Delimited, Xcdr2Mutable)
      val schemas = Seq(
        McapFormat.McapSchema(1, RosName, "ros2msg", RosDef.getBytes("UTF-8")))
      val channels = Seq(McapFormat.McapChannel(1, 1, "/events_ros", "cdr"))
      val msgs = rows.map { r =>
        val vals = Seq[Any](r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getString(5))
        McapFormat.McapMessage(
          channelId = 1,
          sequence = r.getLong(0),
          logTime = r.getLong(1) * 1000L,
          publishTime = r.getLong(1) * 1000L,
          data = CdrCodec.encode(rosBundle, vals,
            flavors(java.lang.Math.floorMod(r.getLong(0), 5L).toInt)))
      }.toSeq
      val tmp = new java.io.File(dir, "events_mutable.mcap.tmp")
      val out = new java.io.FileOutputStream(tmp)
      try out.write(McapFormat.writeMcap(schemas, channels, msgs, "zstd"))
      finally out.close()
      require(tmp.renameTo(f) || f.exists(), s"fixture rename failed: $f")
      done.createNewFile()
      ()
    }
    f.getAbsolutePath
  }

  /** q98's fixture: the documents corpus HTML-wrapped into THREE
    * member-gzipped WARC shards — even ids, odd ids, and (since
    * round 17) a "recrawl" shard of GENUINE `revisit` records: every
    * doc_id%3==0 document re-fetched under a ?recrawl=1 uri, stored
    * as the deduplicating-crawler shape — HTTP head only, body
    * elided, `WARC-Payload-Digest` = sha1:base32 of the original
    * entity bytes, `WARC-Refers-To` = the original record's id, the
    * identical-payload-digest profile. The wrap is
    * extraction-invertible (escaped text in one `<p>` amid
    * script/comment noise), so the pipeline's dedup key md5(html_text)
    * equals DuckDB's md5 over the collapsed original text.
    */
  private def dupCrawlFixture(s: SparkSession, d: String): String =
    synchronized {
      val docs = new java.io.File(d, "documents.parquet")
      val key = md5Key(s"dupcrawlv2:$d:${docs.length}:${docs.lastModified}")
      publishStaged("graft_dupcrawl_" + key) { stage =>
        import graft.warc.WarcFormat
        stage.mkdirs()
        val rows = documents(s, d)
          .select(col("doc_id"), col("text"), col("source")).collect()
        def esc(t: String): String = t
          .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        def wrap(id: Long, text: String): Array[Byte] =
          (s"""<html><head><title></title>
              |<script>if (1 < 2) { x = "</p>"; }</script></head>
              |<body><!-- recrawl fixture $id --><p>${esc(text)}</p>
              |</body></html>""").stripMargin.getBytes("UTF-8")
        def rec(r: org.apache.spark.sql.Row) = {
          val id = r.getLong(0)
          WarcFormat.WriteRecord("response",
            s"https://${r.getString(2)}.example.com/doc/$id",
            WarcFormat.httpResponseBlock(wrap(id, r.getString(1)),
              "text/html; charset=utf-8"),
            contentType = "application/http; msgtype=response",
            recordId = s"<urn:uuid:doc-$id>")
        }
        // the digest a real crawler would have computed over the
        // stored payload — the SAME labeled sha1:base32 the reader's
        // warc_digest expression computes on the response side
        def revisit(r: org.apache.spark.sql.Row) = {
          val id = r.getLong(0)
          WarcFormat.WriteRecord("revisit",
            s"https://${r.getString(2)}.example.com/doc/$id?recrawl=1",
            ("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
              "charset=utf-8\r\n\r\n").getBytes("UTF-8"),
            contentType = "application/http; msgtype=response",
            extraHeaders = Seq(
              "WARC-Payload-Digest" ->
                org.apache.spark.sql.graftfns.WarcDigest
                  .labeled(wrap(id, r.getString(1))),
              "WARC-Refers-To" -> s"<urn:uuid:doc-$id>",
              "WARC-Profile" ->
                "http://netpreservation.org/warc/1.1/revisit/identical-payload-digest"))
        }
        val shards = Seq(
          rows.filter(_.getLong(0) % 2 == 0).sortBy(_.getLong(0)).toSeq
            .map(rec(_)),
          rows.filter(_.getLong(0) % 2 == 1).sortBy(_.getLong(0)).toSeq
            .map(rec(_)),
          rows.filter(_.getLong(0) % 3 == 0).sortBy(_.getLong(0)).toSeq
            .map(revisit(_)))
        shards.zipWithIndex.foreach { case (recs, i) =>
          java.nio.file.Files.write(
            new java.io.File(stage, f"crawl-$i%02d.warc.gz").toPath,
            WarcFormat.writeWarc(
              WarcFormat.WriteRecord("warcinfo", "",
                "software: graft-fixture\r\n".getBytes("UTF-8"),
                contentType = "application/warc-fields") +: recs,
              gzipPerRecord = true))
        }
      }
    }

  /** q94's fixture: every document written as an HTTP-response WARC
    * record (uri `https://<source>.example.com/doc/<doc_id>`, body =
    * text UTF-8) across two member-gzipped shards, plus a warcinfo
    * record per shard — the Common Crawl layout at fixture scale.
    * Cache key derives from the documents parquet's (length, mtime).
    */
  private def warcFixture(s: SparkSession, d: String): String = synchronized {
    val docs = new java.io.File(d, "documents.parquet")
    val key = md5Key(s"warcv1:$d:${docs.length}:${docs.lastModified}")
    publishStaged("graft_warc_" + key) { stage =>
      import graft.warc.WarcFormat
      stage.mkdirs()
      val rows = documents(s, d)
        .select(col("doc_id"), col("text"), col("source"))
        .collect()
      (0 until 2).foreach { shard =>
        val recs = WarcFormat.WriteRecord("warcinfo", "",
          "software: graft-fixture\r\n".getBytes("UTF-8"),
          contentType = "application/warc-fields") +:
          rows.filter(_.getLong(0) % 2 == shard).sortBy(_.getLong(0)).toSeq
            .map { r =>
              WarcFormat.WriteRecord("response",
                s"https://${r.getString(2)}.example.com/doc/${r.getLong(0)}",
                WarcFormat.httpResponseBlock(
                  r.getString(1).getBytes("UTF-8"),
                  "text/plain; charset=utf-8"),
                contentType = "application/http; msgtype=response")
            }
        java.nio.file.Files.write(
          new java.io.File(stage, f"crawl-$shard%02d.warc.gz").toPath,
          WarcFormat.writeWarc(recs, gzipPerRecord = true))
      }
    }
  }

  /** q95's fixture: the documents corpus HTML-wrapped and written as
    * member-gzipped WARC response shards. The wrapping is the exact
    * INVERSE of html_text's extraction contract, so recovering
    * documents.text (up to whitespace collapse) is the gate:
    * text xml-escaped into one or two `<p>` blocks (split at a space —
    * the markup gap collapses back to that space), '!', '?', '"' and
    * ''' additionally entity-encoded (numeric dec/hex + quot/apos —
    * decoding restores the identical char, so the oracle needs no
    * entity logic), surrounded by title-less head noise, a style and
    * a script block (each containing tag-like text that must NOT
    * leak), and an html comment. Per-doc charset utf-8 /
    * iso-8859-1 / utf-16le declared in the HTTP Content-Type.
    */
  private def htmlWarcFixture(s: SparkSession, d: String): String =
    synchronized {
      val docs = new java.io.File(d, "documents.parquet")
      val key = md5Key(s"htmlwarcv1:$d:${docs.length}:${docs.lastModified}")
      publishStaged("graft_htmlwarc_" + key) { stage =>
        import graft.warc.WarcFormat
        stage.mkdirs()
        val rows = documents(s, d).select(col("doc_id"), col("text")).collect()
        def esc(t: String): String = t
          .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
          .replace("!", "&#33;").replace("?", "&#x3F;")
          .replace("\"", "&quot;").replace("'", "&apos;")
        (0 until 2).foreach { shard =>
          val recs = rows.filter(_.getLong(0) % 2 == shard)
            .sortBy(_.getLong(0)).toSeq.map { r =>
              val id = r.getLong(0)
              val text = r.getString(1)
              val mid = text.indexOf(' ', text.length / 2)
              val body =
                if (mid < 0) s"<p>${esc(text)}</p>"
                else s"<p>${esc(text.substring(0, mid))}</p>\n  <BR/>\n" +
                  s"  <p>${esc(text.substring(mid + 1))}</p>"
              val html =
                s"""<!DOCTYPE html>
                   |<html><head><meta charset="fixture"><title></title>
                   |<style type="text/css">body { margin: 0; } /* a > b */</style>
                   |<SCRIPT>if (1 < 2 && "</div>" != x) { y = "&amp;"; }</SCRIPT>
                   |</head>
                   |<body>
                   |<!-- fixture page $id: 1 < 2 -->
                   |$body
                   |</body></html>""".stripMargin
              val ascii = text.forall(_ < 128)
              val cs =
                if (ascii && id % 7 == 0) "utf-16le"
                else if (ascii && id % 7 == 3) "iso-8859-1"
                else "utf-8"
              WarcFormat.WriteRecord("response",
                s"https://crawl.example.com/doc/$id",
                WarcFormat.httpResponseBlock(
                  html.getBytes(java.nio.charset.Charset.forName(cs)),
                  s"text/html; charset=$cs"),
                contentType = "application/http; msgtype=response")
            }
          java.nio.file.Files.write(
            new java.io.File(stage, f"html-$shard%02d.warc.gz").toPath,
            WarcFormat.writeWarc(recs, gzipPerRecord = true))
        }
      }
    }

  /** q102's fixture: the WET sidecar of the q98 crawl, built through
    * the engine's own pipeline AND the DSv2 warc sink — crawl read →
    * revisit resolution → html_text → conversion records → two
    * member-gzipped shards. Keyed on the crawl fixture's path (itself
    * content-salted), plus a version salt for the WET layout.
    */
  private def wetFixture(s: SparkSession, d: String): String = synchronized {
    val crawl = dupCrawlFixture(s, d)
    publishStaged("graft_wet_" + md5Key(s"wetv1:$crawl")) { stage =>
      val text = org.apache.spark.sql.graftfns.HtmlText.htmlText(
        col("payload"), col("http_content_type"))
      val resolved = graft.warc.RevisitResolve
        .resolve(s.read.format("warc").load(crawl))
        .filter(col("http_status") === 200)
        .withColumn("t", text)
      graft.warc.WarcExport.prepareConversion(resolved,
          uri = col("target_uri"), text = col("t"),
          refersTo = col("record_id"))
        .repartition(2)
        .write.format("warc").mode("overwrite")
        .save(new java.io.File(stage, "wet").getAbsolutePath)
    } + "/wet"
  }

  /** q99's fixture: the documents corpus HTML-wrapped (extraction-
    * invertible like q95's) with the WIRE form cycling by doc_id%5:
    * identity / gzip entity / chunked framing / chunked-over-gzip /
    * header-without-charset. The last slot declares its charset only
    * IN the document — `<meta charset="iso-8859-1">` when the text is
    * Latin-1-encodable, a UTF-16LE BOM otherwise — so the HTML5 sniff
    * sits inside the oracle equality for genuinely non-ASCII bytes.
    */
  private def encodedWarcFixture(s: SparkSession, d: String): String =
    synchronized {
      val docs = new java.io.File(d, "documents.parquet")
      val key = md5Key(s"encwarcv2:$d:${docs.length}:${docs.lastModified}")
      publishStaged("graft_encwarc_" + key) { stage =>
        import graft.warc.WarcFormat
        stage.mkdirs()
        val rows = documents(s, d).select(col("doc_id"), col("text")).collect()
        def esc(t: String): String = t
          .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        def html(id: Long, text: String, meta: String): String =
          s"""<html><head>$meta<title></title>
             |<script>if (1 < 2) { x = "</p>"; }</script></head>
             |<body><!-- enc fixture $id --><p>${esc(text)}</p>
             |</body></html>""".stripMargin
        (0 until 2).foreach { shard =>
          val recs = rows.filter(_.getLong(0) % 2 == shard)
            .sortBy(_.getLong(0)).toSeq.map { r =>
              val id = r.getLong(0)
              val text = r.getString(1)
              val plainBody = html(id, text, "").getBytes("UTF-8")
              val (wire, ct, extra) = (id % 5) match {
                case 0 =>
                  (plainBody, "text/html; charset=utf-8", Seq.empty[String])
                case 1 =>
                  (WarcFormat.gzipBody(plainBody), "text/html; charset=utf-8",
                    Seq("Content-Encoding: gzip"))
                case 2 =>
                  (WarcFormat.chunkedBody(plainBody, 64),
                    "text/html; charset=utf-8",
                    Seq("Transfer-Encoding: chunked"))
                case 3 =>
                  // the real-wire nesting: entity gzipped, then the
                  // message chunk-framed — reversed transfer-first
                  (WarcFormat.chunkedBody(WarcFormat.gzipBody(plainBody), 64),
                    "text/html; charset=utf-8",
                    Seq("Content-Encoding: gzip",
                      "Transfer-Encoding: chunked"))
                case _ =>
                  // half the slot takes the BOM path UNCONDITIONALLY:
                  // UTF-16LE bytes under a failed sniff decode as
                  // utf-8 garbage, so the md5 gate is hard even for
                  // pure-ASCII text (where a wrong meta-sniff fallback
                  // would be value-invisible); the other half gates
                  // the <meta> scan and is additionally value-hard
                  // whenever the corpus carries Latin-1 codepoints
                  val h = html(id, text, "")
                  if (id % 10 == 9 || !h.forall(_ <= 0xFF))
                    (Array[Byte](0xFF.toByte, 0xFE.toByte) ++
                      h.getBytes(java.nio.charset.StandardCharsets.UTF_16LE),
                      "text/html", Seq.empty[String])
                  else
                    (html(id, text, "<meta charset=\"iso-8859-1\">")
                      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
                      "text/html", Seq.empty[String])
              }
              WarcFormat.WriteRecord("response",
                s"https://crawl.example.com/doc/$id",
                WarcFormat.httpResponseBlock(wire, ct, extra),
                contentType = "application/http; msgtype=response")
            }
          java.nio.file.Files.write(
            new java.io.File(stage, f"enc-$shard%02d.warc.gz").toPath,
            WarcFormat.writeWarc(recs, gzipPerRecord = true))
        }
      }
    }

  /** Sink-built fixture for q86: the same 1000-row slice EXPORTED as
    * MCAP through the DSv2 write path itself (two partitions — the
    * multi-file fleet layout), one topic per event_type, payload =
    * props UTF-8 bytes. Cached like the other
    * fixtures; salt currently "sinkv3" (bumped whenever the mcap
    * writer's output bytes change — see the cache key below).
    */
  private def exportFixture(s: SparkSession, d: String): String = synchronized {
    publishStaged("graft_container_sinkv3_" + cacheKey(d)) { stage =>
      val ev = events(s, d).orderBy(col("event_id")).limit(1000)
        .select(col("event_id"), us(col("ts")).as("ts_us"),
          col("event_type"), col("props"))
      val prepared = graft.ros.mcap.McapExport.prepare(
        ev.withColumn("payload", encode(col("props"), "UTF-8")),
        topic = concat(lit("/"), col("event_type")),
        logTimeNs = col("ts_us") * lit(1000L),
        data = col("payload"),
        schemaName = lit("graft/Props"),
        sequence = col("event_id"))
      prepared.repartition(2).write.format("mcap").mode("overwrite")
        .save(new java.io.File(stage, "export").getAbsolutePath)
    } + "/export"
  }

  /** Cross-process-safe fixture publish: build into a process-unique
    * STAGING dir (the `_built` marker included), then one atomic
    * directory rename publishes a complete fixture — two concurrent
    * harness JVMs can never interleave their Spark part files in the
    * final dir (the sink's overwrite protocol protects one JOB, not
    * two jobs from different processes; the loser deletes its stage).
    * Returns the published dir's absolute path.
    */
  private def publishStaged(name: String)
      (build: java.io.File => Unit): String = {
    val tmpRoot = new java.io.File(sys.props("java.io.tmpdir"))
    val dir = new java.io.File(tmpRoot, name)
    val done = new java.io.File(dir, "_built")
    if (!done.exists()) {
      val stage = new java.io.File(tmpRoot,
        name + ".stage-" + java.util.UUID.randomUUID().toString.take(8))
      try {
        build(stage)
        new java.io.File(stage, "_built").createNewFile()
        if (!stage.renameTo(dir) && !done.exists()) {
          // the name is occupied by a markerless crash leftover: move
          // it ASIDE (an atomic whole-dir rename — if a valid fixture
          // was published in this window it merely swaps for our
          // byte-identical one, never a delete-under-a-reader), free
          // the name, retry
          val aside = new java.io.File(tmpRoot,
            name + ".crashed-" + java.util.UUID.randomUUID().toString.take(8))
          if (dir.renameTo(aside))
            org.apache.commons.io.FileUtils.deleteQuietly(aside)
          require(stage.renameTo(dir) || done.exists(),
            s"fixture publish failed: $dir")
        }
      } finally
        // covers the loser (another process won the rename) AND a
        // build() failure — no stage debris accumulates in tmp
        if (stage.exists()) {
          org.apache.commons.io.FileUtils.deleteQuietly(stage)
          ()
        }
    }
    dir.getAbsolutePath
  }

  /** q87's twin fixture: the same slice exported through the rosbag
    * and db3 sinks (two partitions each; db3 rolls at 300 rows so the
    * multi-file path is inside the gate). Returns (bagDir, db3Dir).
    */
  private def exportFixture2(s: SparkSession, d: String): (String, String) =
    synchronized {
      val dir = publishStaged("graft_container_sink2v2_" + cacheKey(d)) { stage =>
        val ev = events(s, d).orderBy(col("event_id")).limit(1000)
          .select(col("event_id"), us(col("ts")).as("ts_us"),
            col("event_type"), col("props"))
          .withColumn("payload", encode(col("props"), "UTF-8"))
        val bag = graft.ros.bag.BagExport.prepare(ev,
          topic = concat(lit("/"), col("event_type")),
          timeNs = col("ts_us") * lit(1000L),
          data = col("payload"),
          datatype = lit("graft/Props"))
        bag.repartition(2).write.format("rosbag").mode("overwrite")
          .save(new java.io.File(stage, "bag_export").getAbsolutePath)
        val db3 = graft.ros.db3.Db3Export.prepare(ev,
          topic = concat(lit("/"), col("event_type")),
          timestampNs = col("ts_us") * lit(1000L),
          data = col("payload"),
          tpe = lit("graft/Props"))
        db3.repartition(2).write.format("db3").mode("overwrite")
          .option("rows_per_file", "300")
          .save(new java.io.File(stage, "db3_export").getAbsolutePath)
      }
      (dir + "/bag_export", dir + "/db3_export")
    }

  /** q88's fixture: the q79 mixed directory converted to one mcap
    * archive through the public API. Cache key derives from the mixed
    * dir's path (itself salted by every component fixture's path —
    * the q79 lesson), so a component layout change rebuilds this too.
    */
  private def convertFixture(s: SparkSession, d: String): String =
    synchronized {
      val mixed = mixedFixture(s, d)
      val key = md5Key(mixed)
      // salt v5: r13 changed the writer's emission twice — time-
      // clustered layout + auto-carried definitions (v4), then
      // sequence/publish_time carried through the spine (v5) — stale
      // caches must rebuild
      publishStaged("graft_container_convertv5_" + key) { stage =>
        graft.ros.Convert.run(s, mixed,
          new java.io.File(stage, "export").getAbsolutePath,
          "mcap", partitions = 2)
      } + "/export"
    }

  /** q91/q93's fixture: the q79 mixed directory converted with
    * `transcode=auto` — the bag rows cross the dialect boundary
    * (ros1 → CDR) and, since round 15, the protobuf channel does too
    * (descriptor → rendered ros2msg → CDR). Salt v2: the r15 protobuf
    * crossing changes the archive's bytes for the same inputs.
    */
  private def transcodeFixture(s: SparkSession, d: String): String =
    synchronized {
      val mixed = mixedFixture(s, d)
      publishStaged("graft_container_transcodev2_" + md5Key(mixed)) { stage =>
        graft.ros.Convert.run(s, mixed,
          new java.io.File(stage, "export").getAbsolutePath,
          "mcap", partitions = 2, options = Map("transcode" -> "auto"))
      } + "/export"
    }

  /** q92's fixture: the q79 mixed directory converted INTO a rosbag
    * archive with `transcode=auto` (protobuf filtered — the one
    * dialect with no ros1 rendering). Salt v1.
    */
  private def transcodeBagFixture(s: SparkSession, d: String): String =
    synchronized {
      val mixed = mixedFixture(s, d)
      publishStaged("graft_container_tcbagv1_" + md5Key(mixed)) { stage =>
        graft.ros.Convert.run(s, mixed,
          new java.io.File(stage, "export").getAbsolutePath,
          "rosbag", partitions = 2,
          transform = _.filter(col("encoding") =!= "protobuf"),
          options = Map("transcode" -> "auto"))
      } + "/export"
    }

  /** q96's fixture: the mixed dir converted to rosbag WITHOUT
    * filtering the protobuf channel — `transcode=auto` must lower the
    * graft.test.Event rows through the composed proto→ros2→ros1
    * rendering into genuine ros1 connections (graft_test/Event, real
    * genmsg md5).
    */
  private def transcodeBagFixture2(s: SparkSession, d: String): String =
    synchronized {
      val mixed = mixedFixture(s, d)
      publishStaged("graft_container_tcbag2v1_" + md5Key(mixed)) { stage =>
        graft.ros.Convert.run(s, mixed,
          new java.io.File(stage, "export").getAbsolutePath,
          "rosbag", partitions = 2,
          options = Map("transcode" -> "auto"))
      } + "/export"
    }

  /** db3 twin of [[fixture]]: the same 1000-row slice written as a
    * rosbag2 sqlite database (two CDR topics of the same type splitting
    * even/odd event ids — q83's grouped-metadata gate needs real
    * groups — Humble-style message_definitions), via the engine's own
    * sqlite writer. Dir salt "db3v3": the two-topic layout must not
    * reuse a cached one-topic fixture.
    */
  private def db3Fixture(s: SparkSession, d: String): String = synchronized {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_container_db3v3_" + cacheKey(d))
    dir.mkdirs()
    val f = new java.io.File(dir, "events.db3")
    val done = new java.io.File(dir, "_built")
    if (!done.exists()) {
      val rows = events(s, d).orderBy(col("event_id")).limit(1000)
        .select(col("event_id"), us(col("ts")).as("ts_us"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .collect()
      val rosBundle = Ros2Msg.bundle(RosName, RosDef)
      val msgRows = rows.map { r =>
        Seq[Any](null, if (r.getLong(0) % 2 == 0) 1L else 2L,
          r.getLong(1) * 1000L, // rowid-aliased id, topic, ts ns
          CdrCodec.encode(rosBundle, Seq[Any](r.getLong(0), r.getLong(1),
            r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5))))
      }.toSeq
      val db = graft.ros.db3.SqliteFormat.writeDb(Seq(
        ("topics",
          "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT, serialization_format TEXT, offered_qos_profiles TEXT)",
          Seq(Seq[Any](null, "/events_even", RosName, "cdr", ""),
            Seq[Any](null, "/events_odd", RosName, "cdr", ""))),
        ("messages",
          "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, timestamp INTEGER, data BLOB)",
          msgRows),
        ("message_definitions",
          "CREATE TABLE message_definitions(id INTEGER PRIMARY KEY, topic_type TEXT, encoding TEXT, encoded_message_definition TEXT, type_hash TEXT)",
          Seq(Seq[Any](null, RosName, "ros2idl", RosIdlDef, "RIHS01_graft")))))
      val tmp = new java.io.File(dir, "events.db3.tmp")
      java.nio.file.Files.write(tmp.toPath, db)
      require(tmp.renameTo(f) || f.exists(), s"fixture rename failed: $f")
      done.createNewFile()
      ()
    }
    f.getAbsolutePath
  }

  /** rosbag1 twin of [[fixture]]: the same 1000-row slice written as a
    * classic .bag (bz2-compressed chunks) via the engine's own bag
    * writer — two connections of the same datatype split even/odd
    * event ids, so connection routing is part of the oracle equality.
    */
  private def bagFixture(s: SparkSession, d: String): String = synchronized {
    import graft.ros.bag.BagFormat
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_container_bagv2_" + cacheKey(d)) // v2: genuine md5
    dir.mkdirs()
    val f = new java.io.File(dir, "events.bag")
    val done = new java.io.File(dir, "_built")
    if (!done.exists()) {
      val rows = events(s, d).orderBy(col("event_id")).limit(1000)
        .select(col("event_id"), us(col("ts")).as("ts_us"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .collect()
      val bundle = graft.ros.MsgDefParser.parse(Ros1Name, RosDef)
      val conns = Seq(
        BagFormat.BagConnection(0, "/events_even", Ros1Name, Ros1Md5, RosDef, "graft"),
        BagFormat.BagConnection(1, "/events_odd", Ros1Name, Ros1Md5, RosDef, "graft"))
      val msgs = rows.map { r =>
        val tsUs = r.getLong(1)
        BagFormat.WriteMessage(
          connId = if (r.getLong(0) % 2 == 0) 0 else 1,
          timeSec = (tsUs / 1000000L).toInt,
          timeNsec = ((tsUs % 1000000L) * 1000L).toInt,
          data = graft.ros.RosSchemaMapper.encode(bundle, Seq[Any](
            r.getLong(0), r.getLong(1), r.getLong(2),
            r.getString(3), r.getDouble(4), r.getString(5))))
      }.toSeq
      val tmp = new java.io.File(dir, "events.bag.tmp")
      val out = new java.io.FileOutputStream(tmp)
      try out.write(BagFormat.writeBag(conns, msgs, messagesPerChunk = 100,
        compression = "bz2"))
      finally out.close()
      require(tmp.renameTo(f) || f.exists(), s"fixture rename failed: $f")
      done.createNewFile()
      ()
    }
    f.getAbsolutePath
  }

  /** One directory holding all three container fixtures — q79's
    * input. Builds (or reuses) the per-format fixtures, then copies
    * them in; done-marker + fresh-dir discipline like the others.
    *
    * The cache key is derived from the COMPONENT fixture paths (which
    * embed their own version salts, e.g. db3Fixture's "db3v3"), so a
    * component-layout change can never serve a stale composite: round
    * 11 re-salted the db3 fixture to a two-topic layout but this dir's
    * independent key kept a `_built` marker over the old one-topic
    * `events.db3`, failing q79's oracle (n_topics 1 vs 2).
    */
  private def mixedFixture(s: SparkSession, d: String): String = synchronized {
    val srcs = Seq(fixture(s, d), db3Fixture(s, d), bagFixture(s, d))
    val mixedKey = md5Key(srcs.mkString("|"))
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_container_mixed_" + mixedKey)
    dir.mkdirs()
    val done = new java.io.File(dir, "_built")
    if (!done.exists()) {
      srcs.foreach { src =>
        val f = new java.io.File(src)
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(dir, f.getName).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      done.createNewFile()
      ()
    }
    dir.getAbsolutePath
  }

  val oracle: Map[String, String] = Map(
    "q76_container_roundtrip" ->
      """WITH ev AS (
        |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
        |  FROM events ORDER BY event_id LIMIT 1000)
        |SELECT event_type,
        |       COUNT(*) AS cnt,
        |       CAST(COUNT(*) FILTER (WHERE event_id % 2 = 0) AS BIGINT) AS cnt_pb,
        |       MIN(event_id) AS min_id,
        |       MAX(event_id) AS max_id,
        |       MAX(epoch_us(ts)) AS max_ts_us,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_value,
        |       CAST(SUM(length(props)) AS BIGINT) AS props_chars
        |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q77_db3_roundtrip" ->
      """WITH ev AS (
        |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
        |  FROM events ORDER BY event_id LIMIT 1000)
        |SELECT event_type,
        |       COUNT(*) AS cnt,
        |       MAX(epoch_us(ts)) * 1000 AS max_ts_ns,
        |       MIN(event_id) AS min_id,
        |       MAX(event_id) AS max_id,
        |       CAST(SUM(user_id) AS BIGINT) AS sum_uid,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_value
        |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q78_rosbag_roundtrip" ->
      """WITH ev AS (
        |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
        |  FROM events ORDER BY event_id LIMIT 1000)
        |SELECT event_type,
        |       COUNT(*) AS cnt,
        |       CAST(COUNT(*) FILTER (WHERE event_id % 2 = 0) AS BIGINT) AS cnt_even,
        |       MIN(event_id) AS min_id,
        |       MAX(event_id) AS max_id,
        |       MAX(epoch_us(ts)) AS max_ts_us,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_value,
        |       CAST(SUM(length(props)) AS BIGINT) AS props_chars
        |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q79_mixed_spine" ->
      """WITH ev AS (
        |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
        |  FROM events ORDER BY event_id LIMIT 1000),
        |a AS (
        |  SELECT COUNT(*) AS cnt,
        |         MIN(epoch_us(ts)) * 1000 AS min_ts_ns,
        |         MAX(epoch_us(ts)) * 1000 AS max_ts_ns
        |  FROM ev)
        |SELECT 'db3' AS container, cnt, CAST(2 AS BIGINT) AS n_topics,
        |       min_ts_ns, max_ts_ns FROM a
        |UNION ALL
        |SELECT 'mcap', cnt, CAST(2 AS BIGINT), min_ts_ns, max_ts_ns FROM a
        |UNION ALL
        |SELECT 'rosbag', cnt, CAST(2 AS BIGINT), min_ts_ns, max_ts_ns FROM a
        |ORDER BY container""".stripMargin,
    "q80_metadata_counts" ->
      """WITH ev AS (
        |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
        |  FROM events ORDER BY event_id LIMIT 1000),
        |c AS (
        |  SELECT COUNT(*) FILTER (WHERE event_id % 2 = 0) AS ev_cnt,
        |         COUNT(*) FILTER (WHERE event_id % 2 <> 0) AS od_cnt
        |  FROM ev)
        |SELECT 'mcap' AS container, '/events_pb' AS topic, ev_cnt AS cnt FROM c
        |UNION ALL SELECT 'mcap', '/events_ros', od_cnt FROM c
        |UNION ALL SELECT 'rosbag', '/events_even', ev_cnt FROM c
        |UNION ALL SELECT 'rosbag', '/events_odd', od_cnt FROM c
        |ORDER BY container, topic""".stripMargin,
    "q82_metadata_ranges" ->
      """WITH ev AS (
        |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
        |  FROM events ORDER BY event_id LIMIT 1000),
        |a AS (
        |  SELECT COUNT(*) AS cnt,
        |         MIN(epoch_us(ts)) AS min_us,
        |         MAX(epoch_us(ts)) AS max_us
        |  FROM ev)
        |SELECT 'db3' AS container, cnt,
        |       min_us * 1000 AS min_v, max_us * 1000 AS max_v FROM a
        |UNION ALL
        |SELECT 'mcap', cnt, min_us * 1000, max_us * 1000 FROM a
        |UNION ALL
        |SELECT 'rosbag', cnt, min_us // 1000000, max_us // 1000000 FROM a
        |ORDER BY container""".stripMargin,
    "q83_db3_grouped_info" ->
      """WITH ev AS (
        |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
        |  FROM events ORDER BY event_id LIMIT 1000)
        |SELECT CASE WHEN event_id % 2 = 0
        |            THEN '/events_even' ELSE '/events_odd' END AS topic,
        |       COUNT(*) AS cnt,
        |       MIN(epoch_us(ts)) * 1000 AS min_ts_ns,
        |       MAX(epoch_us(ts)) * 1000 AS max_ts_ns
        |FROM ev GROUP BY 1 ORDER BY topic""".stripMargin,
    "q85_sql_catalog" ->
      """WITH ev AS (
        |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
        |  FROM events ORDER BY event_id LIMIT 1000)
        |SELECT topic, cnt, min_ts_ns, max_ts_ns FROM (
        |  SELECT CASE WHEN event_id % 2 = 0
        |              THEN '/events_pb' ELSE '/events_ros' END AS topic,
        |         COUNT(*) AS cnt,
        |         MIN(epoch_us(ts)) * 1000 AS min_ts_ns,
        |         MAX(epoch_us(ts)) * 1000 AS max_ts_ns
        |  FROM ev GROUP BY 1
        |  UNION ALL
        |  SELECT '/crawl/' || source AS topic, COUNT(*) AS cnt,
        |         MIN(doc_id) AS min_ts_ns, MAX(doc_id) AS max_ts_ns
        |  FROM documents GROUP BY 1
        |) ORDER BY topic""".stripMargin,
    "q86_mcap_export" ->
      """WITH ev AS (
        |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
        |  FROM events ORDER BY event_id LIMIT 1000)
        |SELECT '/' || event_type AS topic,
        |       COUNT(*) AS cnt,
        |       MIN(event_id) AS min_id,
        |       MAX(event_id) AS max_id,
        |       MIN(epoch_us(ts)) * 1000 AS min_ts_ns,
        |       MAX(epoch_us(ts)) * 1000 AS max_ts_ns,
        |       CAST(SUM(strlen(props)) AS BIGINT) AS data_bytes
        |FROM ev GROUP BY 1 ORDER BY topic""".stripMargin,
    "q87_export_roundtrip" ->
      """WITH ev AS (
        |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
        |  FROM events ORDER BY event_id LIMIT 1000),
        |g AS (
        |  SELECT '/' || event_type AS topic,
        |         COUNT(*) AS cnt,
        |         MAX(epoch_us(ts)) AS max_us,
        |         CAST(SUM(strlen(props)) AS BIGINT) AS data_bytes
        |  FROM ev GROUP BY 1)
        |SELECT 'db3' AS container, topic, cnt,
        |       max_us * 1000 AS max_ts, data_bytes FROM g
        |UNION ALL
        |SELECT 'rosbag', topic, cnt, max_us // 1000000, data_bytes FROM g
        |ORDER BY container, topic""".stripMargin,
    "q88_convert_mixed" ->
      """WITH ev AS (
        |  SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
        |  FROM events ORDER BY event_id LIMIT 1000),
        |e AS (
        |  SELECT COUNT(*) AS cnt, MIN(epoch_us(ts)) * 1000 AS mn,
        |         MAX(epoch_us(ts)) * 1000 AS mx
        |  FROM ev WHERE event_id % 2 = 0),
        |o AS (
        |  SELECT COUNT(*) AS cnt, MIN(epoch_us(ts)) * 1000 AS mn,
        |         MAX(epoch_us(ts)) * 1000 AS mx
        |  FROM ev WHERE event_id % 2 <> 0)
        |SELECT '/events_even' AS topic, 2 * e.cnt AS cnt,
        |       e.mn AS min_ts_ns, e.mx AS max_ts_ns FROM e
        |UNION ALL SELECT '/events_odd', 2 * o.cnt, o.mn, o.mx FROM o
        |UNION ALL SELECT '/events_pb', e.cnt, e.mn, e.mx FROM e
        |UNION ALL SELECT '/events_ros', o.cnt, o.mn, o.mx FROM o
        |ORDER BY topic""".stripMargin,
    "q89_convert_typed" ->
      """WITH ev AS (
        |  SELECT * FROM events ORDER BY event_id LIMIT 1000),
        |e AS (
        |  SELECT COUNT(*) AS cnt, MIN(event_id) AS mn, MAX(event_id) AS mx,
        |         CAST(SUM(user_id) AS BIGINT) AS su,
        |         CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS sv
        |  FROM ev WHERE event_id % 2 = 0),
        |o AS (
        |  SELECT COUNT(*) AS cnt, MIN(event_id) AS mn, MAX(event_id) AS mx,
        |         CAST(SUM(user_id) AS BIGINT) AS su,
        |         CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS sv
        |  FROM ev WHERE event_id % 2 <> 0)
        |SELECT '/events_even' AS topic, e.cnt AS cnt, e.mn AS min_id,
        |       e.mx AS max_id, e.su AS sum_uid, e.sv AS sum_value FROM e
        |UNION ALL SELECT '/events_odd', o.cnt, o.mn, o.mx, o.su, o.sv FROM o
        |UNION ALL SELECT '/events_ros', o.cnt, o.mn, o.mx, o.su, o.sv FROM o
        |ORDER BY topic""".stripMargin,
    "q90_mixed_timerange" ->
      """WITH ev AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS ts_ns
        |  FROM events ORDER BY event_id LIMIT 1000),
        |b AS (SELECT MIN(ts_ns) AS mn, MAX(ts_ns) AS mx FROM ev),
        |k AS (SELECT ts_ns FROM ev, b WHERE ts_ns >= b.mn + (b.mx - b.mn) // 2),
        |g AS (SELECT COUNT(*) AS cnt, MIN(ts_ns) AS min_ts_ns,
        |             MAX(ts_ns) AS max_ts_ns FROM k)
        |SELECT 'db3' AS container, cnt, min_ts_ns, max_ts_ns FROM g
        |UNION ALL SELECT 'mcap', cnt, min_ts_ns, max_ts_ns FROM g
        |UNION ALL SELECT 'rosbag', cnt, min_ts_ns, max_ts_ns FROM g
        |ORDER BY container""".stripMargin,
    // the bag's even/odd rows transcode and DOUBLE the db3-sourced
    // topics (decimal sums double exactly before the one rounding);
    // q92 is the SAME shape pointed the other way across the dialect
    // boundary, so both keys share one oracle text
    "q91_transcode_typed" -> DoubledTopicOracle,
    "q92_transcode_rosbag" -> DoubledTopicOracle,
    // the mcap fixture's protobuf channel carries the EVEN event ids
    "q93_transcode_proto" ->
      """WITH ev AS (
        |  SELECT * FROM events ORDER BY event_id LIMIT 1000)
        |SELECT '/events_pb' AS topic, COUNT(*) AS cnt,
        |       MIN(event_id) AS min_id, MAX(event_id) AS max_id,
        |       CAST(SUM(user_id) AS BIGINT) AS sum_uid,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE)
        |         AS sum_value
        |FROM ev WHERE event_id % 2 = 0""".stripMargin,
    // payload bytes vs strlen(text): UTF-8 octets on both sides
    "q94_warc_ingest" ->
      """SELECT source, COUNT(*) AS cnt,
        |       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
        |       CAST(SUM(strlen(text)) AS BIGINT) AS sum_bytes
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // the proto channel's rows land under /events_pb with even event
    // ids — q93's oracle pointed at the rosbag target
    "q96_transcode_proto_rosbag" ->
      """WITH ev AS (
        |  SELECT * FROM events ORDER BY event_id LIMIT 1000)
        |SELECT '/events_pb' AS topic, COUNT(*) AS cnt,
        |       MIN(event_id) AS min_id, MAX(event_id) AS max_id,
        |       CAST(SUM(user_id) AS BIGINT) AS sum_uid,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE)
        |         AS sum_value
        |FROM ev WHERE event_id % 2 = 0""".stripMargin,
    // html_text recovers each document's text up to whitespace
    // collapse; RE2 \s == [\t\n\f\r ] on both sides, md5 over UTF-8
    // octets on both sides
    "q95_html_extract" ->
      """SELECT doc_id,
        |       md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS text_md5,
        |       CAST(length(trim(regexp_replace(text, '\s+', ' ', 'g')))
        |         AS BIGINT) AS nchars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // each event_id%5 slot is one encapsulation flavor — a wrong
    // flavor decode breaks exactly its group
    "q97_mutable_cdr" ->
      """WITH ev AS (
        |  SELECT * FROM events ORDER BY event_id LIMIT 1000)
        |SELECT event_id % 5 AS flavor_slot, COUNT(*) AS cnt,
        |       MIN(event_id) AS min_id, MAX(event_id) AS max_id,
        |       CAST(SUM(user_id) AS BIGINT) AS sum_uid,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE)
        |         AS sum_value,
        |       CAST(SUM(length(props)) AS BIGINT) AS props_chars
        |FROM ev GROUP BY 1 ORDER BY flavor_slot""".stripMargin,
    // the same duplication rule (doc_id%3==0 recrawled once), the same
    // collapse, the same ≥5-word gate, the same md5 dedup key —
    // recomputed straight off `documents`
    // the q95 inversion gate pointed at the SINK's output: conversion
    // payload bytes == the collapsed original text, every record
    // refers-to-linked
    "q102_wet_export" ->
      """SELECT doc_id,
        |       md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS text_md5,
        |       CAST(length(trim(regexp_replace(text, '\s+', ' ', 'g')))
        |         AS BIGINT) AS nchars,
        |       TRUE AS linked
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q95's inversion gate pointed at the wire-decode matrix: text
    // recovery proves de-chunk + inflate + charset sniff all at once;
    // enc_left NULL proves no row kept an undecoded chain
    "q99_warc_encoded" ->
      """SELECT doc_id,
        |       md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS text_md5,
        |       CAST(length(trim(regexp_replace(text, '\s+', ' ', 'g')))
        |         AS BIGINT) AS nchars,
        |       CAST(NULL AS VARCHAR) AS enc_left
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q98_crawl_pipeline" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |         trim(regexp_replace(text, '\s+', ' ', 'g')) AS t,
        |         CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS copies
        |  FROM documents),
        |u AS (
        |  SELECT source, md5(t) AS text_md5,
        |         CAST(SUM(copies) AS BIGINT) AS copies,
        |         MIN(length(t)) AS nchars,
        |         MIN(length(t) - length(replace(t, ' ', '')) + 1) AS words
        |  FROM t GROUP BY 1, 2)
        |SELECT source, CAST(SUM(copies) AS BIGINT) AS docs_total,
        |       COUNT(*) AS docs_unique,
        |       CAST(SUM(nchars) AS BIGINT) AS uniq_chars
        |FROM u WHERE words >= 5 GROUP BY source ORDER BY source""".stripMargin,
    // the addressed id set, content md5'd straight off documents —
    // the indexed fetch path must land byte-identical text
    "q103_cdx_lookup" ->
      """SELECT doc_id, md5(text) AS text_md5,
        |       CAST(length(text) AS BIGINT) AS nchars
        |FROM documents
        |WHERE doc_id % 10 = 3 AND doc_id < 100
        |ORDER BY doc_id""".stripMargin,
    // each slot's EXPECTED canonical/host/domain/SURT form, stated as
    // literals — the canonicalization rules themselves are the gate
    "q104_url_canon" ->
      """SELECT doc_id,
        |  CASE doc_id % 8
        |    WHEN 0 THEN 'https://'||source||'.example.com/doc/'||doc_id
        |    WHEN 1 THEN 'https://www.'||source||'.example.com/doc/'||doc_id
        |    WHEN 2 THEN 'http://'||source||'.example.co.uk:8080/a/doc/'||doc_id
        |    WHEN 3 THEN 'https://'||source||'.example.com/doc/'||doc_id||'?a=1&b=2'
        |    WHEN 4 THEN 'https://'||source||'.example.com/doc/'||doc_id
        |    WHEN 5 THEN 'ftp://'||source||'.example.com/doc/'||doc_id
        |    WHEN 6 THEN 'https://192.168.0.1/doc/'||doc_id
        |    ELSE 'mailto:'||source||'@example.com' END AS canon,
        |  CASE doc_id % 8
        |    WHEN 1 THEN 'www.'||source||'.example.com'
        |    WHEN 2 THEN source||'.example.co.uk'
        |    WHEN 6 THEN '192.168.0.1'
        |    WHEN 7 THEN NULL
        |    ELSE source||'.example.com' END AS host,
        |  CASE doc_id % 8
        |    WHEN 2 THEN 'example.co.uk'
        |    WHEN 6 THEN '192.168.0.1'
        |    WHEN 7 THEN NULL
        |    ELSE 'example.com' END AS domain,
        |  CASE doc_id % 8
        |    WHEN 2 THEN 'uk,co,example,'||source||':8080)/a/doc/'||doc_id
        |    WHEN 3 THEN 'com,example,'||source||')/doc/'||doc_id||'?a=1&b=2'
        |    WHEN 6 THEN '192.168.0.1)/doc/'||doc_id
        |    WHEN 7 THEN NULL
        |    ELSE 'com,example,'||source||')/doc/'||doc_id END AS surt
        |FROM documents ORDER BY doc_id""".stripMargin,
    // domain fold replicated per slot, then the q67 mixture arithmetic
    "q105_domain_stats" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    CASE doc_id % 8
        |      WHEN 1 THEN 'www.'||source||'.example.com'
        |      WHEN 2 THEN source||'.example.co.uk'
        |      WHEN 6 THEN '192.168.0.1'
        |      WHEN 7 THEN NULL
        |      ELSE source||'.example.com' END AS host,
        |    CASE doc_id % 8
        |      WHEN 2 THEN 'example.co.uk'
        |      WHEN 6 THEN '192.168.0.1'
        |      WHEN 7 THEN NULL
        |      ELSE 'example.com' END AS domain
        |  FROM documents),
        |s AS (
        |  SELECT domain, COUNT(*) AS docs,
        |         COUNT(DISTINCT host) AS hosts,
        |         CAST(SUM(n_chars) AS BIGINT) AS chars
        |  FROM u WHERE domain IS NOT NULL GROUP BY 1),
        |g AS (SELECT CAST(SUM(docs) AS BIGINT) AS tot_docs FROM s)
        |SELECT domain, docs, hosts, chars,
        |  FLOOR(CAST(docs AS DOUBLE) / tot_docs * 1000000.0 + 0.5)
        |    / 1000000.0 AS share
        |FROM s, g ORDER BY domain""".stripMargin)

  // lazy: referenced from the `oracle` map initializer above
  private lazy val DoubledTopicOracle =
    """WITH ev AS (
      |  SELECT * FROM events ORDER BY event_id LIMIT 1000),
      |e AS (
      |  SELECT COUNT(*) AS cnt, MIN(event_id) AS mn, MAX(event_id) AS mx,
      |         CAST(SUM(user_id) AS BIGINT) AS su,
      |         SUM(CAST(value AS DECIMAL(28,10))) AS s
      |  FROM ev WHERE event_id % 2 = 0),
      |o AS (
      |  SELECT COUNT(*) AS cnt, MIN(event_id) AS mn, MAX(event_id) AS mx,
      |         CAST(SUM(user_id) AS BIGINT) AS su,
      |         SUM(CAST(value AS DECIMAL(28,10))) AS s
      |  FROM ev WHERE event_id % 2 <> 0)
      |SELECT '/events_even' AS topic, e.cnt * 2 AS cnt, e.mn AS min_id,
      |       e.mx AS max_id, e.su * 2 AS sum_uid,
      |       CAST(ROUND(e.s * 2, 2) AS DOUBLE) AS sum_value FROM e
      |UNION ALL SELECT '/events_odd', o.cnt * 2, o.mn, o.mx, o.su * 2,
      |       CAST(ROUND(o.s * 2, 2) AS DOUBLE) FROM o
      |UNION ALL SELECT '/events_ros', o.cnt, o.mn, o.mx, o.su,
      |       CAST(ROUND(o.s, 2) AS DOUBLE) FROM o
      |ORDER BY topic""".stripMargin
}
