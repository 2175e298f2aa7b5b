package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The corpus-derived knob ladders: selection boundaries, the recall
  * math they advertise, and the config legality requires. (The
  * pair-set/recall EQUIVALENCE of the configs on real corpora lives in
  * LlmQueriesSpec — this spec pins the pure functions.)
  */
class LshTuningSpec extends AnyFunSuite {

  test("minhash ladder: scheme selection and the S-curve recall it promises") {
    import LshTuning.minhashScheme
    assert(minhashScheme(500) == LshTuning.MinHashScheme(16, 8, 2))
    assert(minhashScheme(100000) == LshTuning.MinHashScheme(16, 8, 2))
    assert(minhashScheme(100001) == LshTuning.MinHashScheme(32, 16, 2))
    assert(minhashScheme(10000001) == LshTuning.MinHashScheme(48, 16, 3))
    // recall at the 0.5 confirm threshold stays high on every rung
    for (n <- Seq(1L, 1000000L, 1000000000L)) {
      val s = minhashScheme(n)
      assert(s.recallAt(0.5) >= 0.85, s"$s recall@0.5 = ${s.recallAt(0.5)}")
      assert(s.recallAt(0.9) >= 0.999)
    }
    // the scale rungs suppress moderate-similarity candidate mass
    assert(minhashScheme(1e8.toLong).recallAt(0.3) <
      minhashScheme(1000000).recallAt(0.3))
    // bands*rows must equal numHashes
    intercept[IllegalArgumentException](LshTuning.MinHashScheme(16, 8, 3))
  }

  test("simhash blocking ladder: key width tracks corpus size, guarantee holds") {
    import LshTuning.simhashBlocking
    assert(simhashBlocking(500) == LshTuning.SimHashBlocking(4, 1))
    assert(simhashBlocking(200001) == LshTuning.SimHashBlocking(8, 3))
    assert(simhashBlocking(30000001L) == LshTuning.SimHashBlocking(8, 4))
    // every rung keeps the hamming<=3 pigeonhole guarantee and widens keys
    val widths = Seq(500L, 1000000L, 100000000L).map(n => simhashBlocking(n))
    widths.foreach(b => assert(b.blocks - b.blocksPerKey >= 3))
    assert(widths.map(_.keyBits) == Seq(16, 24, 32))
    assert(LshTuning.SimHashBlocking(8, 3).keysPerDoc == 56)
    assert(LshTuning.SimHashBlocking(8, 4).keysPerDoc == 70)
    // illegal configs rejected: guarantee violated or width not integral
    intercept[IllegalArgumentException](LshTuning.SimHashBlocking(4, 2))
    intercept[IllegalArgumentException](LshTuning.SimHashBlocking(5, 1))
  }

  test("winnow window and pair cap ladders are monotone in corpus size") {
    val ns = Seq(100L, 100000L, 1000000L, 10000000L, 100000000L)
    val ws = ns.map(LshTuning.winnowWindow)
    assert(ws == ws.sorted && ws.head == 4 && ws.last == 8)
    val caps = ns.map(LshTuning.pairCap)
    assert(caps == caps.sorted && caps.head == 1024 && caps.last == 2048)
  }
}
