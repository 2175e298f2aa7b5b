package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfns.BloomScreen
import graft.SparkTestBase

class BloomScreenSpec extends SparkTestBase {
  import spark.implicits._

  test("no false negatives: every inserted key tests positive") {
    val keys = (0 until 5000).map(i => s"shingle $i")
    val bf = BloomScreen.build(keys.toDF("s"), col("s"), expectedItems = 5000)
    val misses = keys.toDF("s")
      .filter(!BloomScreen.mightContain(bf, col("s"))).count()
    assert(misses == 0, s"$misses members screened out — bloom must never false-negative")
  }

  test("misses are screened: non-member pass-through stays near fpp") {
    val members = (0 until 5000).map(i => s"in $i")
    val bf = BloomScreen.build(members.toDF("s"), col("s"), expectedItems = 5000, fpp = 0.01)
    val probes = (0 until 20000).map(i => s"out $i").toDF("s")
    val passed = probes.filter(BloomScreen.mightContain(bf, col("s"))).count()
    // 1% target; allow generous slack for hash variance
    assert(passed < 20000 * 0.05,
      s"$passed/20000 non-members passed — screening is not effective")
  }

  test("bloom-prefiltered semi-join returns exactly the plain semi-join rows") {
    val corpus = (0 until 10000).map(i => (i.toLong, s"k${i % 300}")).toDF("id", "k")
    val probe = (0 until 90).map(i => s"k${i * 3}").toDF("k")
    val exact = corpus.join(probe, Seq("k"), "left_semi")
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    val bf = BloomScreen.build(probe, col("k"), expectedItems = 100)
    val screened = corpus.filter(BloomScreen.mightContain(bf, col("k")))
      .join(probe, Seq("k"), "left_semi")
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(screened == exact)
  }

  test("empty build yields an all-false filter, not a crash") {
    val bf = BloomScreen.build(Seq.empty[String].toDF("s"), col("s"), expectedItems = 10)
    val passed = Seq("a", "b").toDF("s")
      .filter(BloomScreen.mightContain(bf, col("s"))).count()
    assert(passed == 0)
  }

  test("build parameters are validated") {
    intercept[IllegalArgumentException] {
      BloomScreen.build(Seq("a").toDF("s"), col("s"), expectedItems = 0)
    }
    intercept[IllegalArgumentException] {
      BloomScreen.build(Seq("a").toDF("s"), col("s"), expectedItems = 10, fpp = 1.5)
    }
  }

  test("above-cap build is not clamped and leaves the session bloom confs untouched") {
    // BloomFilterAggregate clamps sizing to these session confs at
    // job-submission time, so the build path must not depend on them
    // at all — an oversized build gets its exact geometry and the
    // confs stay exactly as they were (Spark's own runtime bloom-join
    // filters in unrelated queries read the same keys)
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val before = (spark.conf.getOption(bitsKey), spark.conf.getOption(itemsKey))
    // 50M items needs > 64M default bit cap and > 4M default item cap
    val bf = BloomScreen.build(
      (0 until 1000).map(i => s"k$i").toDF("s"), col("s"),
      expectedItems = 50000000L, fpp = 0.01)
    // exact-geometry check, not `> cap`: the serialized form carries a
    // ~16-byte header, so a filter clamped to the 64M-bit default still
    // has length*8 > 64M — the loose inequality cannot catch clamping.
    val wantBits = math.ceil(-50000000L * math.log(0.01) / (math.log(2) * math.log(2))).toLong
    val expectedLen = {
      val empty = org.apache.spark.util.sketch.BloomFilter.create(50000000L, wantBits)
      val bos = new java.io.ByteArrayOutputStream()
      empty.writeTo(bos); bos.toByteArray.length
    }
    assert(bf.length == expectedLen,
      s"filter was clamped: ${bf.length} bytes, expected $expectedLen (${wantBits} bits)")
    assert((spark.conf.getOption(bitsKey), spark.conf.getOption(itemsKey)) == before,
      "session bloom caps were not restored after build")
    // and the filter built inside the window still works
    assert((0 until 1000).map(i => s"k$i").toDF("s")
      .filter(!BloomScreen.mightContain(bf, col("s"))).count() == 0)
  }
}
