package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Additional operator coverage for SURVEY.md §2.2's category sweep:
  * ranking/offset/ntile window functions, GROUPING SETS, statistical
  * aggregates (computed from decimal-exact moments so both engines get
  * bit-identical doubles), map functions over parsed JSON, and
  * approximate distinct counting (no oracle — HLL implementations
  * differ; bounded-error-checked in ExtraQueriesSpec).
  */
object ExtraQueries {
  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(
    // Q108 — STREAMING checkpoint-replay under the oracle gate (the
    // longest-standing non-oracle surface, promoted in round 18): the
    // events table lands as FIVE parquet files across THREE separate
    // streaming query incarnations sharing one checkpoint — run 1
    // aggregates files 0-1 (hour-windowed per-type counts + decimal
    // sums, watermarked, append to a parquet sink), run 2 RESUMES the
    // checkpoint over files 2-3 (its state must replay or rows
    // double/vanish), run 3 resumes again onto a far-future sentinel
    // whose event time pushes the watermark past every real window so
    // the final no-data batch emits them all. The query aggregates
    // the SINK's files; DuckDB recomputes the same hour-window
    // two-level rollup straight off `events` — so watermark
    // semantics, state recovery across restarts, append-mode
    // finalization AND the exactly-once file sink all sit inside one
    // DuckDB equality (windows-per-type catches a dropped or
    // double-emitted window even where the sums would survive).
    // The streaming run happens ONCE per corpus (staged fixture, the
    // wetFixture convention); the 35-day watermark delay keeps every
    // real row on-time regardless of file arrival order while the
    // sentinel (max_ts + 50 days) still closes every real window.
    "q108_stream_replay" -> ((s, d) => {
      val out = streamReplayFixture(s, d)
      s.read.parquet(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("windows"),
          sum(col("cnt")).as("cnt"),
          round(sum(col("sv")), 2).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // Q36 — ranking + offset windows over orders per customer.
    "q36_rank_windows" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"))
        .orderBy(col("o_custkey"), col("rnk"), col("o_orderkey"))
    }),

    // Q37 — GROUPING SETS (the general form of Q05's rollup / Q21's cube).
    "q37_grouping_sets" -> ((s, d) =>
      customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupingSets(
          Seq(Seq(col("n_name"), col("c_mktsegment")), Seq(col("n_name")), Seq()),
          col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("n_name"), asc_nulls_first("c_mktsegment"))),

    // Q38 — statistical aggregates from decimal-exact moments: both
    // engines compute sum/sumsq exactly, then the same double formula —
    // no accumulation-order drift (stddev_samp/var_samp built-ins would
    // drift between engines).
    "q38_stats_agg" -> ((s, d) => {
      val x = col("l_extendedprice").cast("decimal(28,10)")
      lineitem(s, d).groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("s1"),
        sum(x * x).cast("double").as("s2"))
        .select(
          col("l_returnflag"), col("n"),
          rk(col("s1") / col("n"), 4).as("mean"),
          rk((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1), 4).as("variance"),
          rk(sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)), 4).as("stddev"))
        .orderBy(col("l_returnflag"))
    }),

    // Q39 — map functions over parsed JSON: events.props → map, key
    // access + cardinality (the connection-header map model, reference
    // FlattenedRosWriter.cpp:218-220).
    "q39_map_funcs" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.MapType(org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)).as("m"))
        .select(col("event_id"),
          element_at(col("m"), "k").cast("long").as("k_val"),
          size(map_keys(col("m"))).cast("long").as("n_keys"))
        .orderBy(col("event_id"))),

    // Q40 — approx_count_distinct (HLL++), CHECKED: the sketch estimate
    // is engine-specific, so the row carries the EXACT per-group count
    // (DuckDB recomputes it) plus `within_eps`, a checked
    // |approx-exact|/exact <= 0.05 bound (rsd configured 0.02; measured
    // relative error at the verify corpus <= 0.007, so the gate has
    // ~7× margin). The round-5 `no_oracle` row is now a real pass/fail:
    // a sketch regression past 5% fails the hash compare.
    "q40_approx_distinct" -> ((s, d) =>
      orders(s, d).groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx"),
          countDistinct(col("o_custkey")).as("exact_cust"))
        .select(col("o_orderstatus"), col("exact_cust"),
          (abs(col("approx") - col("exact_cust")).cast("double") /
            col("exact_cust") <= 0.05).as("within_eps"))
        .orderBy(col("o_orderstatus"))),

    // Q41 — full outer join (completes the join family; both-null sides
    // forced by disjoint-ish customer subsets).
    "q41_full_outer" -> ((s, d) => {
      val c = customer(s, d)
      val a = c.filter(col("c_acctbal") > 9000).select(col("c_custkey").as("ka"))
      val b = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("kb"))
      a.join(b, col("ka") === col("kb"), "full_outer")
        .select(coalesce(col("ka"), col("kb")).as("k"),
          col("ka").isNotNull.as("is_rich"),
          col("kb").isNotNull.as("is_building"))
        .orderBy(col("k"))
    }),

    // Q55 — gap-based sessionization: a new session starts when a user
    // is idle > 12h (the events stream's median inter-event gap is
    // ~7h, p90 ~25h, so the cut is non-vacuous both ways). The classic
    // clickstream/robot-log operator: lag → boundary flag → running
    // session number → per-session aggregation. Scale shape: ONE
    // shuffle — all three windows and the final groupBy share the
    // user_id hash partitioning, so the lag, the cumulative sum and
    // the aggregation pipeline within a single exchange. Session skew
    // = user skew; a hot user is still one partition's worth of rows,
    // never a cross-partition structure.
    "q55_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gapUs = 43200L * 1000000L // 12h in micros
      events(s, d)
        .withColumn("prev_us", lag(us(col("ts")), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull || us(col("ts")) - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_no", sum(col("new_sess")).over(cum))
        .groupBy(col("user_id"), col("session_no"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          rk(sum(col("value").cast("decimal(28,10)")).cast("double"), 4).as("sum_value"))
        .orderBy(col("user_id"), col("session_no"))
    }),

    // Q56 — per-group embedding centroids: the mean vector of each
    // lang's documents — the domain-centroid primitive behind corpus
    // clustering, mixture balancing, and SemDeDup-style semantic
    // grouping. Output is (lang, dim, centroid) rows, not arrays: the
    // long layout keeps the oracle compare exact and the Spark plan a
    // plain map-combined agg. Determinism: elements are micro-quantized
    // to integers BEFORE summation (same trick as KMeans/q51) so the
    // per-cell sum is exact long arithmetic in any shuffle order.
    // Scale shape: broadcast dim join (doc→lang), posexplode (64×
    // rows, map-side), one partial-agg shuffle keyed (lang, dim) —
    // cardinality k×64, trivially small whatever the corpus size.
    "q56_group_centroids" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("lang"))
      embeddings(s, d)
        .join(broadcast(docs), col("vec_id") === col("doc_id"))
        .select(col("lang"), posexplode(col("embedding")))
        .withColumnRenamed("pos", "dim").withColumnRenamed("col", "x")
        .groupBy(col("lang"), col("dim").cast("long").as("dim"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("x").cast("double") * 1e6 + 0.5).cast("long")).as("sx"))
        .select(col("lang"), col("dim"),
          rk(col("sx").cast("double") / (col("n") * lit(1e6)), 6).as("centroid"))
        .orderBy(col("lang"), col("dim"))
    }),

    // Q57 — inverted index: per token, document frequency and a BOUNDED
    // posting-list sample (the 8 lowest doc_ids). The search/dedup-
    // support artifact over a corpus. Hot tokens ("the") are the skew
    // case: a naive collect_list holds the full posting list in one
    // aggregation buffer — unbounded. Here the sample comes from
    // row_number <= 8 within each token, so no buffer exceeds 8
    // entries regardless of token frequency, and df is a plain count.
    // The window and the groupBy share the token hash partitioning:
    // one distinct shuffle + one token shuffle, both bounded.
    "q57_inverted_index" -> ((s, d) => {
      // the staged termFreqs relation's rows ARE the distinct
      // (doc_id, token) pairs (it is grouped on exactly that key), so
      // the posting-list derivation reads the cache instead of
      // re-exploding the corpus and paying a distinct shuffle per
      // invocation (round 18, guide §2.4)
      val td = LlmQueries.termFreqs(s, d)
        .select(col("doc_id"), col("token"))
      val w = Window.partitionBy(col("token")).orderBy(col("doc_id"))
      td.withColumn("rn", row_number().over(w))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("df"),
          array_join(transform(
            sort_array(collect_list(when(col("rn") <= 8, col("doc_id")))),
            _.cast("string")), ",").as("posting_sample"))
        .orderBy(col("df").desc, col("token")).limit(100)
    }),

    // Q58 — the as-of join through the CUSTOM OPERATOR stack
    // (AsOfJoinPlan logical node → AsOfJoinStrategy → sort-merge
    // AsOfJoinExec; SURVEY.md §7.3 ladder (c)) — same semantics as
    // q22's union+window encoding, checked against DuckDB's native
    // ASOF JOIN. One shuffle per side, O(1) merge state, no window
    // buffers.
    "q58_asof_native" -> ((s, d) => {
      val e = events(s, d)
        .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("event_id"))
        .select(col("user_id"), col("ts"),
          col("event_id").as("matched_event_id"), col("ts").as("matched_ts"))
      val o = orders(s, d).select(col("o_orderkey"),
        col("o_custkey").as("user_id"), col("o_orderdate"))
      graft.operators.AsOfJoin
        .native(e, o, "user_id", "ts", "o_orderdate",
          Seq("matched_event_id", "matched_ts"))
        .select(col("o_orderkey"), col("matched_event_id"),
          ntz(col("matched_ts")).as("matched_ts"))
        .orderBy(col("o_orderkey"))
    }),

    // Q62 — pivot (wide reshaping): per-source document counts spread
    // across one column per language. Spark's relational pivot with an
    // EXPLICIT value list — at 100 TB the implicit form would run a
    // distinct-values job over the corpus and then hit the
    // spark.sql.pivotMaxValues ceiling; a declared domain keeps it to
    // ONE map-side-combined aggregation. Missing cells coalesce to 0
    // (count semantics), matching the oracle's FILTER form.
    "q62_pivot" -> ((s, d) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      documents(s, d)
        .groupBy(col("source"))
        .pivot("lang", langs)
        .agg(count(lit(1)))
        .select(col("source") +:
          langs.map(l => coalesce(col(l), lit(0L)).as(s"n_$l")): _*)
        .withColumn("n_total", langs.map(l => col(s"n_$l")).reduce(_ + _))
        .orderBy(col("source"))
    })
  )

  /** q108's staged streaming run — see the query comment. Returns the
    * parquet SINK directory the three checkpoint-sharing incarnations
    * appended into. Cached per corpus under /tmp keyed on the events
    * parquet's (length, mtime) + a version salt; `_done` marker
    * commits the build (the container-fixture convention).
    */
  private def streamReplayFixture(s: SparkSession, d: String): String =
    synchronized {
      import org.apache.spark.sql.streaming.Trigger
      val ev = new java.io.File(d, "events.parquet")
      val key = {
        val md = java.security.MessageDigest.getInstance("MD5")
        md.update(s"streamreplayv1:$d:${ev.length}:${ev.lastModified}"
          .getBytes("UTF-8"))
        md.digest().map(b => f"$b%02x").mkString.take(16)
      }
      val root = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_streamreplay_" + key)
      val out = new java.io.File(root, "out")
      val done = new java.io.File(root, "_done")
      if (done.exists()) return out.getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(root)
      val inputs = new java.io.File(root, "in")
      val ck = new java.io.File(root, "ck").getAbsolutePath
      inputs.mkdirs()
      // the stream's input layout: micro-floored ts (what DuckDB reads
      // off the nanos parquet too) as TIMESTAMP — watermarks require
      // the instant type; the UTC runtime keeps its hour truncation
      // aligned with DuckDB's date_trunc over the NTZ values — one
      // slice per event_id%4
      val base = events(s, d)
        .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
          col("event_type"), col("value"))
      val maxTs = base.agg(max(col("ts"))).collect()(0)
        .getAs[java.sql.Timestamp](0)
      def land(name: String, df: DataFrame, mtime: Long): Unit = {
        val stagedDir = new java.io.File(root, s"stage_$name")
        df.coalesce(1).write.mode("overwrite").parquet(stagedDir.getAbsolutePath)
        val part = stagedDir.listFiles().find(f =>
          f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).get
        val target = new java.io.File(inputs, s"$name.parquet")
        java.nio.file.Files.move(part.toPath, target.toPath)
        target.setLastModified(mtime)
        org.apache.commons.io.FileUtils.deleteQuietly(stagedDir)
      }
      def run(): Unit = {
        val q = s.readStream
          .schema(base.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(inputs.getAbsolutePath)
          .withWatermark("ts", "35 days")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(28,10)")).as("sv"))
          .select(col("w.start").as("ws"), col("event_type"),
            col("cnt"), col("sv"))
          .writeStream.format("parquet")
          .option("checkpointLocation", ck)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start(out.getAbsolutePath)
        q.awaitTermination(300000)
        ()
      }
      val t0 = System.currentTimeMillis()
      land("f0", base.filter(pmod(col("event_id"), lit(4)) === 0), t0 - 4000)
      land("f1", base.filter(pmod(col("event_id"), lit(4)) === 1), t0 - 3000)
      run() // incarnation 1: files 0-1
      land("f2", base.filter(pmod(col("event_id"), lit(4)) === 2), t0 - 2000)
      land("f3", base.filter(pmod(col("event_id"), lit(4)) === 3), t0 - 1000)
      run() // incarnation 2: checkpoint resume over files 2-3
      // the sentinel: one far-future row that drags the watermark past
      // every real window; its own window can never emit
      land("sentinel", base.limit(1).select(
        lit(-1L).as("event_id"),
        lit(new java.sql.Timestamp(maxTs.getTime + 50L * 86400 * 1000))
          .as("ts"),
        lit("__sentinel__").as("event_type"),
        lit(0.0).as("value")), t0)
      run() // incarnation 3: watermark flush emits all real windows
      done.createNewFile()
      out.getAbsolutePath
    }

  val oracle: Map[String, String] = Map(
    // the same hour-window two-level rollup straight off `events`; the
    // sentinel's window never emits (the watermark cannot pass it) so
    // only real event types appear
    "q108_stream_replay" ->
      """WITH w AS (
        |  SELECT date_trunc('hour', ts) AS ws, event_type,
        |         COUNT(*) AS cnt,
        |         SUM(CAST(value AS DECIMAL(28,10))) AS sv
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, COUNT(*) AS windows,
        |       CAST(SUM(cnt) AS BIGINT) AS cnt,
        |       CAST(ROUND(SUM(sv), 2) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1 ORDER BY event_type""".stripMargin,
    // q40's estimate is sketch-specific; DuckDB checks the exact count
    // and the TRUE literal gates the Spark-side epsilon bound (see the
    // query comment).
    "q40_approx_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS exact_cust,
        |       TRUE AS within_eps
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q36_rank_windows" ->
      """SELECT o_orderkey, o_custkey,
        |       CAST(RANK() OVER w AS INT) AS rnk,
        |       CAST(DENSE_RANK() OVER w AS INT) AS drnk,
        |       CAST(NTILE(4) OVER w AS INT) AS quartile,
        |       LEAD(o_orderkey, 1) OVER w AS next_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rnk, o_orderkey""".stripMargin,
    "q37_grouping_sets" ->
      """SELECT n_name, c_mktsegment, COUNT(*) AS cnt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
    "q38_stats_agg" ->
      """WITH g AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS s1,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))
        |                * CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS s2
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |       FLOOR(s1 / n * 10000.0 + 0.5) / 10000.0 AS mean,
        |       FLOOR((s2 - s1 * s1 / n) / (n - 1) * 10000.0 + 0.5) / 10000.0 AS variance,
        |       FLOOR(sqrt((s2 - s1 * s1 / n) / (n - 1)) * 10000.0 + 0.5) / 10000.0 AS stddev
        |FROM g ORDER BY l_returnflag""".stripMargin,
    "q39_map_funcs" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |       CAST(len(json_keys(props)) AS BIGINT) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,
    "q41_full_outer" ->
      """SELECT COALESCE(a.ka, b.kb) AS k,
        |       a.ka IS NOT NULL AS is_rich, b.kb IS NOT NULL AS is_building
        |FROM (SELECT c_custkey AS ka FROM customer WHERE c_acctbal > 9000) a
        |FULL OUTER JOIN (SELECT c_custkey AS kb FROM customer
        |                 WHERE c_mktsegment = 'BUILDING') b ON a.ka = b.kb
        |ORDER BY k""".stripMargin,
    "q55_sessionize" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
        |l AS (
        |  SELECT user_id, ts, event_id, value,
        |         LAG(epoch_us(ts), 1) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM ev),
        |f AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |                 OR epoch_us(ts) - prev_us > 43200000000 THEN 1
        |            ELSE 0 END AS new_sess
        |  FROM l),
        |s AS (
        |  SELECT user_id, ts, value,
        |         CAST(SUM(new_sess) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |           AS session_no
        |  FROM f)
        |SELECT user_id, session_no, COUNT(*) AS n_events,
        |       MIN(ts) AS session_start, MAX(ts) AS session_end,
        |       FLOOR(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
        |         * 10000.0 + 0.5) / 10000.0 AS sum_value
        |FROM s GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin,
    "q56_group_centroids" ->
      """WITH j AS (
        |  SELECT d.lang, e.embedding
        |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
        |x AS (
        |  SELECT lang,
        |         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
        |         unnest(embedding) AS x
        |  FROM j),
        |g AS (
        |  SELECT lang, dim, COUNT(*) AS n,
        |         SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS sx
        |  FROM x GROUP BY lang, dim)
        |SELECT lang, dim,
        |       FLOOR(CAST(sx AS DOUBLE) / (n * 1000000.0) * 1000000.0 + 0.5)
        |         / 1000000.0 AS centroid
        |FROM g ORDER BY lang, dim""".stripMargin,
    "q57_inverted_index" ->
      """WITH t0 AS (
        |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |           x -> x <> '')) AS token
        |  FROM documents),
        |td AS (SELECT DISTINCT doc_id, token FROM t0),
        |r AS (
        |  SELECT token, doc_id,
        |         ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn
        |  FROM td)
        |SELECT token, COUNT(*) AS df,
        |       array_to_string(list_sort(list(doc_id) FILTER (rn <= 8)), ',')
        |         AS posting_sample
        |FROM r GROUP BY token
        |ORDER BY df DESC, token LIMIT 100""".stripMargin,
    "q58_asof_native" ->
      """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
        |e AS (
        |  SELECT user_id, ts, MAX(event_id) AS event_id
        |  FROM ev GROUP BY user_id, ts)
        |SELECT o_orderkey, e.event_id AS matched_event_id, e.ts AS matched_ts
        |FROM orders
        |ASOF LEFT JOIN e ON o_custkey = e.user_id AND e.ts <= o_orderdate
        |ORDER BY o_orderkey""".stripMargin,
    "q62_pivot" ->
      """SELECT source,
        |       COUNT(*) FILTER (lang = 'de') AS n_de,
        |       COUNT(*) FILTER (lang = 'en') AS n_en,
        |       COUNT(*) FILTER (lang = 'es') AS n_es,
        |       COUNT(*) FILTER (lang = 'fr') AS n_fr,
        |       COUNT(*) FILTER (lang = 'zh') AS n_zh,
        |       COUNT(*) FILTER (lang IN ('de','en','es','fr','zh')) AS n_total
        |FROM documents GROUP BY source ORDER BY source""".stripMargin
    // q40: no oracle (sketch-based)
  )
}
