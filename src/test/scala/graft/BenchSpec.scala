package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench protocol's pure helpers — the parts whose failure would
  * silently corrupt the committed artifact rather than any query.
  */
class BenchSpec extends AnyFunSuite {

  test("median: odd, even, single") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) === 2.5)
    assert(Bench.median(Seq(7.5)) === 7.5)
  }

  test("dispersed: flags the r9 contamination shapes, passes stable sets") {
    // outlier max (one sample took a load spike)
    assert(Bench.dispersed(Seq(0.27, 0.30, 6.2)))
    // contaminated median (two of three samples rode the spike;
    // the min is the plan's true cost)
    assert(Bench.dispersed(Seq(0.27, 4.7, 6.2)))
    // stable multi-second set — must NOT escalate
    assert(!Bench.dispersed(Seq(1.9, 2.0, 2.1)))
    // mild noise within 3x stays untouched
    assert(!Bench.dispersed(Seq(0.5, 0.9, 1.2)))
  }

  test("loadavg renders a three-element JSON array on linux") {
    val s = Bench.loadavg()
    assert(s == "null" || s.matches("""\[[0-9.]+,[0-9.]+,[0-9.]+\]"""), s)
  }

  test("load_contaminated: foreign load flags, bench self-load does not") {
    val cpus = Runtime.getRuntime.availableProcessors
    val q = cpus / 4.0
    val beforeT = math.max(1.0, math.min(2.0, q))
    def j(l: Double) = s"[$l,0.0,0.0]"
    // idle box, idle after: clean
    assert(!Bench.loadContaminated(j(0.5), j(0.5), benchThreads = 4))
    // r11's shape: heavy foreign load before the run
    assert(Bench.loadContaminated(j(q + 1), j(0.5), benchThreads = 4))
    // r13's shape: before-load 3.03 said "clean" under the old cpus/4
    // threshold while the medians drifted ~40% — must flag now
    assert(Bench.loadContaminated(j(3.03), j(0.5), benchThreads = 4))
    // the bench's OWN sbt/JVM startup tail (<= threshold) stays clean
    assert(!Bench.loadContaminated(j(beforeT - 0.1), j(0.5), benchThreads = 4))
    // after-sample within the bench's own ramp allowance: clean
    assert(!Bench.loadContaminated(j(0.5), j(3.4), benchThreads = 4))
    // after-sample beyond self-load + quarter-box: foreign co-tenant
    assert(Bench.loadContaminated(j(0.5), j(4 + q + 1), benchThreads = 4))
    // unavailable /proc/loadavg never flags
    assert(!Bench.loadContaminated("null", "null", benchThreads = 4))
    // PERSISTENT DISPERSAL: a query whose samples stay dispersed after
    // escalation means the medians sit on contaminated samples — the
    // artifact self-labels even when the loadavg snapshots missed the
    // spike
    assert(Bench.loadContaminated(j(0.5), j(0.5), benchThreads = 4,
      dispersedAfterEscalation = 1))
    assert(!Bench.loadContaminated(j(0.5), j(0.5), benchThreads = 4,
      dispersedAfterEscalation = 0))
    // ...but only a SUSPECT MEDIAN counts as dispersal-contamination:
    // a tight (min ≈ med) cluster with one first-sample cache-build
    // max still escalates, yet must not impeach the artifact
    assert(!Bench.medianSuspect(Seq(0.15, 0.17, 3.4)),
      "max outlier over a tight cluster: median trustworthy")
    assert(Bench.medianSuspect(Seq(0.27, 4.7, 6.2)),
      "median sitting on inflated samples must flag")
    assert(Bench.dispersed(Seq(0.15, 0.17, 3.4)),
      "the same shape still warrants MORE SAMPLES (escalation)")
  }

  test("median drift vs clean baseline: flags the r16 loaded-box shape") {
    // the exact r16 blind spot: before-load 1.42 (< 2, passes), after
    // 4.65 (< threads + cpus/4, passes), zero dispersal — yet queries
    // untouched for ten rounds ran 5-16x their committed clean
    // medians. The drift detector is the only signal that fires.
    val clean = Map("q31_ann_lsh" -> 1.07, "q37_grouping_sets" -> 0.38,
      "q38_stats_agg" -> 0.29, "q14_limit" -> 0.14, "q60_sem" -> 2.46)
    val loaded = Map("q31_ann_lsh" -> 11.0, "q37_grouping_sets" -> 4.51,
      "q38_stats_agg" -> 4.76, "q14_limit" -> 0.30, "q60_sem" -> 2.60)
    val drifted = Bench.driftedQueries(clean, loaded)
    assert(drifted === Seq("q31_ann_lsh", "q37_grouping_sets", "q38_stats_agg"))
    assert(Bench.loadContaminated("[1.42,1.59,1.57]", "[4.65,3.71,2.5]",
      benchThreads = 32, dispersedAfterEscalation = 0,
      driftedVsBaseline = drifted.size), "the r16 artifact must self-label")
    // an idle same-plan re-run drifts 0-1 queries (committed history:
    // every consecutive clean pair shows <= 1) — must stay clean
    val rerun = Map("q31_ann_lsh" -> 0.95, "q37_grouping_sets" -> 0.41,
      "q38_stats_agg" -> 0.33, "q14_limit" -> 0.41, "q60_sem" -> 2.2)
    assert(Bench.driftedQueries(clean, rerun) === Seq.empty,
      "sub-floor noise (q14 0.14->0.41) must not count as drift")
    // ONE genuine >3x drift (a real single-query regression) must not
    // impeach the whole run — regressions are per-query signal, not
    // box contamination
    val oneReg = rerun.updated("q60_sem", 9.0)
    assert(Bench.driftedQueries(clean, oneReg) === Seq("q60_sem"))
    assert(!Bench.loadContaminated("[0.5,0,0]", "[2.0,0,0]",
      benchThreads = 32, driftedVsBaseline = 1))
    // a failed query (med = -1) never counts as drifted
    assert(Bench.driftedQueries(clean,
      Map("q31_ann_lsh" -> -1.0)) === Seq.empty)
  }

  test("mid-run load ramp beyond the bench's own allowance flags") {
    // clean history ramps at most +7.95 (the suite's own threads under
    // the 1-min decay); a +12 ramp is a co-tenant landing mid-run
    assert(Bench.loadContaminated("[1.0,0,0]", "[13.0,0,0]",
      benchThreads = 32))
    assert(!Bench.loadContaminated("[1.0,0,0]", "[9.0,0,0]",
      benchThreads = 32), "the bench's own ramp must not flag")
    // a GENUINELY idle box (0.00, not unavailable) stays armed — the
    // unavailable sentinel is -1, never 0
    assert(Bench.loadContaminated("[0.0,0,0]", "[13.0,0,0]",
      benchThreads = 32), "idle-zero before must not disarm the ramp")
    // before unavailable -> the ramp signal never fires
    assert(!Bench.loadContaminated("null", "[13.0,0,0]",
      benchThreads = 32))
    assert(Bench.load1("null") === -1.0, "unavailable is a sentinel, not 0")
  }

  test("readBaseline: sf-mismatched or missing baselines disarm cleanly") {
    val dir = java.nio.file.Files.createTempDirectory("benchspec").toFile
    val f = new java.io.File(dir, "baseline.json")
    java.nio.file.Files.write(f.toPath,
      """{"metric":"clean_baseline","sf":"/root/testdata/sf0.1","queries":{"q01":0.25,"q02":1.5}}"""
        .getBytes("UTF-8"))
    assert(Bench.readBaseline(f.getAbsolutePath, "/root/testdata/sf0.1") ===
      Map("q01" -> 0.25, "q02" -> 1.5))
    // an sf0.01 local baseline must NOT become the sf0.1 reference
    // frame (every query would read as drifted)
    assert(Bench.readBaseline(f.getAbsolutePath, "/root/testdata/sf0.01")
      === Map.empty)
    assert(Bench.readBaseline(
      new java.io.File(dir, "absent.json").getAbsolutePath,
      "/root/testdata/sf0.1") === Map.empty)
    java.nio.file.Files.write(f.toPath, "{not json".getBytes("UTF-8"))
    assert(Bench.readBaseline(f.getAbsolutePath, "/root/testdata/sf0.1")
      === Map.empty)
  }

  test("baseline state is visible and cross-sf writes are refused") {
    val dir = java.nio.file.Files.createTempDirectory("benchspec2").toFile
    val f = new java.io.File(dir, "baseline.json")
    java.nio.file.Files.write(f.toPath,
      """{"metric":"clean_baseline","sf":"/root/testdata/sf0.1","queries":{"q01":0.25}}"""
        .getBytes("UTF-8"))
    // the artifact must distinguish "checked and clean" from
    // "detector disarmed" — 'drifted: 0' alone reads identically
    assert(Bench.readBaselineWithState(f.getAbsolutePath,
      "/root/testdata/sf0.1")._2 === "ok")
    assert(Bench.readBaselineWithState(f.getAbsolutePath,
      "/root/testdata/sf0.001")._2 === "sf_mismatch")
    assert(Bench.readBaselineWithState(
      new java.io.File(dir, "absent.json").getAbsolutePath,
      "/root/testdata/sf0.1")._2 === "none")
    // the write-protect key: a clean sf0.001 local run must NOT be
    // allowed to clobber the committed sf0.1 reference frame
    assert(Bench.baselineSf(f.getAbsolutePath)
      === Some("/root/testdata/sf0.1"))
    assert(Bench.baselineSf(
      new java.io.File(dir, "absent.json").getAbsolutePath) === None)
  }

  test("merged artifact format: total + detail + duckdb_total, one JSON line each") {
    // the shape the round protocol commits: graft.Bench writes the
    // first two lines, tools/duckdb_bench.py appends the third —
    // PERF.md cites only this file, so its format is under test
    val merged =
      """{"metric":"total","value":23.96,"unit":"sec","runs":3,"load_contaminated":false,"queries":{"q01":0.2}}
        |{"metric":"detail","loadavg":{"before":[0.1,0.2,0.3],"after":[4.0,1.0,0.5]},"spread":{"q01":{"min":0.19,"med":0.2,"max":0.21,"n":3}}}
        |{"metric":"duckdb_total","value":34.46,"unit":"sec","sf":"/root/testdata/sf0.1","spark_total":23.96,"ratio":0.6953,"loadavg":[0.1,0.2,0.3],"queries":{"q01":0.3}}
        |""".stripMargin
    assert(Bench.artifactMetrics(merged) === Seq("total", "detail", "duckdb_total"))
    // duplicate metric lines (a double merge) must fail loudly
    assertThrows[IllegalArgumentException] {
      Bench.artifactMetrics(merged + """{"metric":"duckdb_total","value":1}""")
    }
    // an unparseable line must fail loudly, not pass silently
    assertThrows[Exception] {
      Bench.artifactMetrics("""{"metric":"total",""")
    }
  }

  test("minimal total line: parseable JSON, size-bounded at any suite size") {
    // the LAST stdout line: the driver's ~2000-char tail capture must
    // always keep it whole, so the fields are fixed-count (no per-query
    // map) and the whole line stays far under the window even with
    // extreme values
    val fields = Bench.minimalFields(123456.789012, 9,
      contaminated = true, stillDispersed = 99, nq = 9999, nerr = 9999)
    val line = s"""{"metric":"total_min",$fields,"sf":"/root/testdata/sf0.1"}"""
    assert(line.length < 512, s"minimal line too long: ${line.length}")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("metric").asText() === "total_min")
    assert(node.get("value").asDouble() === 123456.789012)
    assert(node.get("runs").asInt() === 9)
    assert(node.get("load_contaminated").asBoolean())
    assert(node.get("nq").asInt() === 9999)
  }

  test("settle gate: waits until the load drops, bounded, sentinel never waits") {
    // the retry-to-clean pre-gate (r17: the driver's bench landed in a
    // loaded window and shipped 212 s against a true 29-47 s — the
    // detector labeled it but nothing WAITED for a clean window)
    var calls = 0
    val loads = Seq(5.0, 4.0, 1.5, 0.5)
    val slept = scala.collection.mutable.ArrayBuffer[Long]()
    val (l, polls) = Bench.settleGate(2.0, maxPolls = 10, pollMs = 7L,
      load = () => { val v = loads(math.min(calls, loads.size - 1)); calls += 1; v },
      sleep = slept += _)
    assert(l === 1.5 && polls === 2 && slept.toSeq === Seq(7L, 7L))
    // bounded: a persistently loaded box stops at maxPolls and the
    // attempt proceeds (self-labeling contaminated downstream)
    val (l2, p2) = Bench.settleGate(2.0, maxPolls = 3, pollMs = 1L,
      load = () => 9.9, sleep = _ => ())
    assert(l2 === 9.9 && p2 === 3)
    // the unavailable-loadavg sentinel (-1) must not spin the full cap:
    // there is nothing to wait for, and the verdict is disarmed anyway
    val (l3, p3) = Bench.settleGate(2.0, maxPolls = 3, pollMs = 1L,
      load = () => -1.0,
      sleep = _ => throw new IllegalStateException("must not sleep"))
    assert(l3 === -1.0 && p3 === 0)
    // the gate's bar IS the verdict's bar — a run that waited "until
    // clean" must then also LABEL clean on the before signal
    val cpus = Runtime.getRuntime.availableProcessors
    assert(!Bench.loadContaminated(
      s"[${Bench.beforeThreshold(cpus) - 0.01},0,0]", "[0.5,0,0]",
      benchThreads = 4))
  }

  test("esc escapes JSON-hostile characters") {
    assert(Bench.esc("a\"b\\c\nd") === "a\\\"b\\\\c\\nd")
    assert(Bench.esc("\u0001") === "\\u0001")
  }
}
