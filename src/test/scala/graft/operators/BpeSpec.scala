package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** BPE vocabulary induction + apply — the deterministic contract the
  * q100 oracle replays in SQL.
  */
class BpeSpec extends AnyFunSuite {

  test("golden: the textbook corpus learns the expected merges") {
    // Sennrich's running example shape: 'low'/'lower'/'newest'/'widest'
    val wf = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val r = BpeTrain.train(wf, 4)
    // pair counts round 1: 'e s' 9, 's t' 9, 'l o' 7, 'o w' 7, ...
    // ties break on the smallest "a b" string: "e s" < "s t"
    assert(r.merges.head === ("e", "s"))
    assert(r.merges(1) === ("es", "t"), "merged symbol participates next round")
    assert(r.merges(2) === ("l", "o"), "'l o' 7 beats 'o w' 7 on the tie-break")
    assert(r.merges(3) === ("lo", "w"))
    assert(r.segments("newest").toSeq === Seq("n", "e", "w", "est"))
    assert(r.segments("low").toSeq === Seq("low"))
  }

  test("apply replays training: in-vocab words reproduce their training segmentation") {
    val corpus = Seq("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "how vexingly quick daft zebras jump")
      .flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => (w, g.size.toLong) }.toSeq.sortBy(_._1)
    for (rounds <- Seq(0, 1, 5, 20, 200)) {
      val r = BpeTrain.train(corpus, rounds)
      val enc = new BpeEncoder(r.merges)
      corpus.foreach { case (w, _) =>
        assert(enc.segment(w).toSeq === r.segments(w).toSeq,
          s"word '$w' at $rounds rounds")
      }
    }
  }

  test("segmentation invariants: concatenation restores the word; determinism") {
    val corpus = Seq(("aaa", 4L), ("aab", 3L), ("abab", 2L), ("z", 1L))
    val r = BpeTrain.train(corpus, 6)
    val enc = new BpeEncoder(r.merges)
    for (w <- Seq("aaa", "aab", "abab", "z", "ababab", "unseen", "a")) {
      assert(enc.segment(w).mkString("") === w, s"lossless: $w")
    }
    // same input, same merges — training is a pure function
    assert(BpeTrain.train(corpus, 6).merges === r.merges)
    // out-of-vocab words segment with whatever merges apply
    assert(enc.segment("unseen").forall(_.nonEmpty))
  }

  test("left-to-right non-overlapping merge (the oracle's doubled-space replace)") {
    // 'a a a' counts the pair twice but merges once, keeping the tail
    assert(BpeTrain.mergeOnce(Array("a", "a", "a"), "a", "a").toSeq
      === Seq("aa", "a"))
    assert(BpeTrain.mergeOnce(Array("a", "b", "a", "b"), "a", "b").toSeq
      === Seq("ab", "ab"), "adjacent occurrences both merge")
    assert(BpeTrain.mergeOnce(Array("x", "a", "b", "y"), "a", "b").toSeq
      === Seq("x", "ab", "y"))
    assert(BpeTrain.mergeOnce(Array("a"), "a", "a").toSeq === Seq("a"))
    // no occurrence: the input array comes back untouched
    val in = Array("q", "r")
    assert(BpeTrain.mergeOnce(in, "a", "b") eq in)
  }

  test("byte fallback: non-trainable tokens segment to <0xNN> units") {
    val enc = new BpeEncoder(Seq(("a", "b")))
    // trainable tokens take the merges — fallback must not leak in
    assert(enc.segmentWithByteFallback("abab").toSeq === Seq("ab", "ab"))
    // ASCII non-alpha: one unit per byte
    assert(enc.segmentWithByteFallback("a1").toSeq === Seq("<0x61>", "<0x31>"))
    // multi-byte UTF-8: é = C3 A9
    assert(enc.segmentWithByteFallback("é").toSeq === Seq("<0xc3>", "<0xa9>"))
    // CJK (3 bytes/char) and a 4-byte supplementary codepoint
    assert(enc.segmentWithByteFallback("数").length === 3)
    assert(enc.segmentWithByteFallback("👍").length === 4)
    // uppercase is NOT trainable (the ^[a-z]+$ filter), so bytes
    assert(enc.segmentWithByteFallback("Ab").toSeq === Seq("<0x41>", "<0x62>"))
    assert(BpeEncoder.isTrainable("word") && !BpeEncoder.isTrainable("")
      && !BpeEncoder.isTrainable("naïve"))
    // units concatenate back to the exact byte sequence
    val units = enc.segmentWithByteFallback("café№7")
    assert(units.length === "café№7".getBytes("UTF-8").length)
    val bytes = units.map(u =>
      Integer.parseInt(u.substring(3, 5), 16).toByte)
    assert(new String(bytes, "UTF-8") === "café№7", "byte-lossless")
    assert(enc.segmentTokenString("a1") === "<0x61> <0x31>")
  }

  test("dry corpus stops early; zero rounds is identity") {
    val single = Seq(("a", 3L), ("b", 2L)) // only 1-symbol words
    assert(BpeTrain.train(single, 10).merges === Seq.empty)
    val r0 = BpeTrain.train(Seq(("abc", 1L)), 0)
    assert(r0.merges === Seq.empty)
    assert(r0.segments("abc").toSeq === Seq("a", "b", "c"))
  }
}
