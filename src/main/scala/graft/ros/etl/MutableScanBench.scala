package graft.ros.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Typed-scan cost of the mutable encapsulations vs their final twins,
  * same content, same session: four mcap files carry IDENTICAL rows of
  * a wide message (strings + a double array around two small numeric
  * fields), one file per flavor (XCDR1, PL_CDR, XCDR2 final, PL_CDR2).
  * Two queries per file through the vectorized typed reader:
  *
  *  - `full`: every payload column materialized — the mutable flavors
  *    pay their per-member headers (EMHEADER / 4-byte param header per
  *    field) on top of the same value decode, so this bounds the
  *    header overhead a mutable-extensibility fleet costs a full scan;
  *  - `pruned`: ONE int column projected out of the wide row — the
  *    final flavors must WALK every pruned member (string lengths,
  *    array counts) to find it, while the mutable flavors skip each
  *    pruned member in O(1) by its declared length. This is the
  *    "header-before-payload" economics, per member.
  *
  * Medians of 5 after an untimed warm run; MB/s against each file's
  * own on-disk size (the mutable files are a few % larger — headers).
  * Run: sbt "runMain graft.ros.etl.MutableScanBench [targetMB]"
  * Writes BENCH_mutable.json (one JSON line per flavor).
  */
object MutableScanBench {
  private val Name = "graft_msgs/msg/Wide"
  private val Def =
    "int64 seq\nstring tag\nstring note\nfloat64[] xs\nstring blurb\nint32 k"

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted; s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val targetMB = if (args.nonEmpty) args(0).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.ros.mcap.{CdrCodec, McapFormat, Ros2Msg}
    import CdrCodec.{Xcdr1, Xcdr1Mutable, Xcdr2Final, Xcdr2Mutable}

    val bundle = Ros2Msg.bundle(Name, Def)
    // ~260 B of values per row (before headers); deterministic content
    // so every flavor file carries byte-for-value identical rows
    val n = ((targetMB.toLong << 20) / 300L).toInt
    System.err.println(s"generating $n rows per flavor file...")
    def vals(i: Int): Seq[Any] = Seq(
      i.toLong,
      s"tag-${i % 97}-${"x" * (i % 23)}",
      s"note ${i % 1013} ${"y" * (i % 41)}",
      Seq.tabulate(10)(j => i * 0.001 + j),
      s"blurb ${"z" * (24 + i % 31)} ${i % 7}",
      i % 211)

    val dir = java.nio.file.Files.createTempDirectory("mutable_scan_bench")
    val flavors = Seq(
      "xcdr1" -> Xcdr1, "pl_cdr" -> Xcdr1Mutable,
      "xcdr2_final" -> Xcdr2Final, "pl_cdr2" -> Xcdr2Mutable)

    val paths = flavors.map { case (label, flavor) =>
      val msgs = (0 until n).map { i =>
        val t = 1700000000000000000L + i * 1000000L
        McapFormat.McapMessage(1, i.toLong, t, t,
          CdrCodec.encode(bundle, vals(i), flavor))
      }
      val p = dir.resolve(s"bench_$label.mcap")
      java.nio.file.Files.write(p, McapFormat.writeMcap(
        Seq(McapFormat.McapSchema(1, Name, "ros2msg", Def.getBytes("UTF-8"))),
        Seq(McapFormat.McapChannel(1, 1, "/wide", "cdr")),
        msgs, chunkGroups = math.max(1, msgs.size / 256)))
      label -> p.toString
    }

    val expectK = (0 until n).map(i => (i % 211).toLong).sum
    def scan(path: String) = spark.read.format("mcap")
      .option("schema_name", Name).load(path)
    // one closure per (flavor, query); samples INTERLEAVED round-robin
    // across all eight cells so an environmental burst (the co-tenant
    // pressure PERF.md documents for this box) lands on every cell
    // roughly equally instead of poisoning whichever flavor ran during
    // it — the same rationale as ClusterAB's A B A B ordering
    val cells: Seq[((String, String), () => Unit)] = paths.flatMap {
      case (label, path) => Seq(
        ((label, "full"), () => {
          val r = scan(path).agg(count(lit(1)), sum("seq"), sum("k"),
            sum(length(col("tag"))), sum(length(col("blurb")))).collect().head
          require(r.getLong(0) == n && r.getLong(2) == expectK,
            s"$label/full drifted")
        }),
        ((label, "pruned"), () => {
          val r = scan(path).agg(sum("k"), count(lit(1))).collect().head
          require(r.getLong(1) == n && r.getLong(0) == expectK,
            s"$label/pruned drifted")
        }))
    }
    cells.foreach(_._2()) // untimed warm pass (JIT, page cache, codegen)
    val loadBefore = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val reps = 7
    val samples = scala.collection.mutable.Map[(String, String),
      List[Double]]().withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      cells.foreach { case (key, q) =>
        val t0 = System.nanoTime()
        q()
        samples(key) = ((System.nanoTime() - t0) / 1e9) :: samples(key)
      }
    }
    val sparkLines = paths.map { case (label, path) =>
      val mb = java.nio.file.Files.size(java.nio.file.Paths.get(path)) / 1e6
      val parts = Seq("full", "pruned").map { qname =>
        val sec = median(samples((label, qname)))
        f""""$qname":{"sec":$sec%.3f,"mb_per_sec":${mb / sec}%.2f}"""
      }
      val loadAfter = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      f"""{"metric":"mutable_scan_$label","unit":"MB/s","file_mb":$mb%.1f,"rows":$n,"reps":$reps,"load_before":$loadBefore%.2f,"load_after":$loadAfter%.2f,${parts.mkString(",")}}"""
    }

    // ---- codec-level section: ONE thread, no Spark scheduler ----
    // The end-to-end numbers above carry a ~0.3 s job-overhead floor
    // and this box's co-tenant bursts; the flavor-vs-flavor question
    // ("what do the member headers cost, what do the O(1) skips buy")
    // is a CODEC property, measured here as a single-threaded
    // walkMessage loop over pre-encoded payloads — same interleaved
    // sampling, MB/s over the payloads' own byte size.
    import graft.ros.mcap.CdrColumnarRead
    import org.apache.spark.sql.execution.vectorized.{OnHeapColumnVector, WritableColumnVector}
    val flat = graft.ros.RosSchemaMapper.flatSchema(bundle)
    val nCodec = math.min(n, 200000)
    val payloads: Seq[(String, Array[Array[Byte]])] = flavors.map {
      case (label, fl) =>
        label -> Array.tabulate(nCodec)(i => CdrCodec.encode(bundle, vals(i), fl))
    }
    def walkAll(msgs: Array[Array[Byte]], keep: Option[Set[String]]): Unit = {
      val vectors = OnHeapColumnVector.allocateColumns(4096, flat)
      val idx = flat.fieldNames.zipWithIndex.toMap
      val colFor: String => Option[WritableColumnVector] = name => keep match {
        case Some(k) if !k(name) => None
        case _ => idx.get(name).map(vectors(_))
      }
      val progs = new CdrColumnarRead.CdrPrograms(bundle, colFor)
      var i = 0
      while (i < msgs.length) {
        if (i % 4096 == 0) vectors.foreach(_.reset())
        CdrColumnarRead.walkMessage(progs, msgs(i))
        i += 1
      }
      vectors.foreach(_.close())
    }
    val codecCells: Seq[((String, String), () => Unit)] = payloads.flatMap {
      case (label, msgs) => Seq(
        ((label, "codec_full"), () => walkAll(msgs, None)),
        ((label, "codec_pruned"), () => walkAll(msgs, Some(Set("k")))))
    }

    // nested shape: a 40-element array of structs between the two
    // numeric fields. Pruning `k` under XCDR1 must WALK all 40
    // elements (no DHEADERs); XCDR2 bounds the collection with a
    // DHEADER (O(1) jump) and the MUTABLE flavors bound the whole
    // member with its header (O(1) skip) — the shape where the
    // member-length machinery actually buys scan time, vs the flat
    // shape above where every member is already length-prefixed.
    val NestedName = "graft_msgs/msg/Nest"
    val NestedDef =
      "int64 seq\ngraft_msgs/Sub[] subs\nint32 k\n" +
        "================================================================================\n" +
        "MSG: graft_msgs/Sub\nint32 tag\nfloat64 w\nstring label"
    val nestedBundle = Ros2Msg.bundle(NestedName, NestedDef)
    val nestedFlat = graft.ros.RosSchemaMapper.flatSchema(nestedBundle)
    import org.apache.spark.sql.Row
    def nestedVals(i: Int): Seq[Any] = Seq(
      i.toLong,
      Seq.tabulate(40)(j => Row(i + j, i * 0.01 + j, s"s${(i + j) % 89}")),
      i % 211)
    val nNested = math.min(n, 50000)
    val nestedPayloads: Seq[(String, Array[Array[Byte]])] = flavors.map {
      case (label, fl) =>
        label -> Array.tabulate(nNested)(i =>
          CdrCodec.encode(nestedBundle, nestedVals(i), fl))
    }
    def walkNested(msgs: Array[Array[Byte]]): Unit = {
      val vectors = OnHeapColumnVector.allocateColumns(4096, nestedFlat)
      val idx = nestedFlat.fieldNames.zipWithIndex.toMap
      val colFor: String => Option[WritableColumnVector] =
        name => if (name == "k") idx.get(name).map(vectors(_)) else None
      val progs = new CdrColumnarRead.CdrPrograms(nestedBundle, colFor)
      var i = 0
      while (i < msgs.length) {
        if (i % 4096 == 0) vectors.foreach(_.reset())
        CdrColumnarRead.walkMessage(progs, msgs(i))
        i += 1
      }
      vectors.foreach(_.close())
    }
    val nestedCells: Seq[((String, String), () => Unit)] = nestedPayloads.map {
      case (label, msgs) => ((label, "codec_nested_pruned"), () => walkNested(msgs))
    }
    val allCodecCells = codecCells ++ nestedCells
    allCodecCells.foreach(_._2()) // warm (JIT)
    val codecSamples = scala.collection.mutable.Map[(String, String),
      List[Double]]().withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      allCodecCells.foreach { case (key, q) =>
        val t0 = System.nanoTime()
        q()
        codecSamples(key) = ((System.nanoTime() - t0) / 1e9) :: codecSamples(key)
      }
    }
    val codecLines = payloads.zip(nestedPayloads).map {
      case ((label, msgs), (_, nmsgs)) =>
        val mb = msgs.iterator.map(_.length.toLong).sum / 1e6
        val nmb = nmsgs.iterator.map(_.length.toLong).sum / 1e6
        val parts = Seq("codec_full", "codec_pruned").map { qname =>
          val sec = median(codecSamples((label, qname)))
          f""""$qname":{"sec":$sec%.3f,"mb_per_sec":${mb / sec}%.2f}"""
        } :+ {
          val sec = median(codecSamples((label, "codec_nested_pruned")))
          f""""codec_nested_pruned":{"sec":$sec%.3f,"mb_per_sec":${nmb / sec}%.2f}"""
        }
        f"""{"metric":"mutable_codec_$label","unit":"MB/s","payload_mb":$mb%.1f,"nested_mb":$nmb%.1f,"rows":$nCodec,"nested_rows":$nNested,"reps":$reps,"threads":1,${parts.mkString(",")}}"""
    }

    val lines = sparkLines ++ codecLines
    graft.Bench.writeArtifact("BENCH_mutable.json", lines)
    lines.foreach(println)
    spark.stop()
  }
}
