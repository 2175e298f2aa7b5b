package graft.operators

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016,
  * arXiv:1508.07909) — the step between corpus curation and sequence
  * packing in a training-data pipeline: learn a merge table from the
  * corpus, then segment words into subword units with it. q64 already
  * computes one round's pair statistics; this operator runs the full
  * deterministic merge LOOP and the apply side.
  *
  * Scale shape: the corpus collapses to its (word, freq) table with
  * ONE count shuffle — that table is the SUFFICIENT STATISTIC for
  * every merge round (the original algorithm runs on word-freq
  * dictionaries, never the raw corpus), and it is vocabulary-bounded,
  * not corpus-bounded. The driver holds it (capped, deterministic:
  * top-K by (freq DESC, word) — the tail's pair mass is negligible by
  * construction) and runs the merge loop locally, the
  * [[KMeans]]-train shape: bounded driver-side statistics, never a
  * driver loop over corpus rows. Apply ships the learned merges
  * inside a codegen expression
  * ([[org.apache.spark.sql.graftfns.BpeSegment]]) — plan-embedded, so
  * executors need no side channel.
  *
  * Determinism contract (the q100 oracle replays it in unrolled SQL):
  * symbols start as the word's characters; each round counts ALL
  * adjacent symbol pairs weighted by word frequency (overlapping
  * occurrences each count, the reference algorithm's Counter
  * semantics), picks the pair with the highest count — ties broken by
  * the lexicographically SMALLEST "a b" string — and merges its
  * occurrences left-to-right non-overlapping in every word. Training
  * stops early when no pair remains.
  */
object BpeTrain {

  final case class Result(merges: Seq[(String, String)],
      segments: Map[String, Array[String]])

  /** One merge pass, left-to-right non-overlapping — shared verbatim
    * by training and [[BpeEncoder.segment]] so apply provably replays
    * training.
    */
  def mergeOnce(sym: Array[String], a: String, b: String): Array[String] = {
    var i = 0
    var hits = 0
    while (i < sym.length - 1) {
      if (sym(i) == a && sym(i + 1) == b) { hits += 1; i += 2 } else i += 1
    }
    if (hits == 0) return sym
    val out = new Array[String](sym.length - hits)
    var j = 0
    i = 0
    while (i < sym.length) {
      if (i < sym.length - 1 && sym(i) == a && sym(i + 1) == b) {
        out(j) = a + b; i += 2
      } else { out(j) = sym(i); i += 1 }
      j += 1
    }
    out
  }

  /** Learn up to `rounds` merges from a (word, freq) table. Words
    * must carry no spaces: the pair-count key and the apply side's
    * segmentation string are space-joined, so a space INSIDE a symbol
    * would make the "a b" key ambiguous and record merges that can
    * never apply (q100/q101 filter to ^[a-z]+$; this guards direct
    * operator callers).
    */
  def train(wordFreqs: Seq[(String, Long)], rounds: Int): Result = {
    require(rounds >= 0, s"merge rounds must be >= 0: $rounds")
    wordFreqs.find(_._1.contains(' ')).foreach { case (w, _) =>
      throw new IllegalArgumentException(
        s"BPE words must not contain spaces (space-joined pair keys " +
          s"would be ambiguous): '$w'")
    }
    val words = wordFreqs.map { case (w, f) =>
      (w.toCharArray.map(_.toString), f)
    }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var r = 0
    var dry = false
    while (r < rounds && !dry) {
      val counts = new java.util.HashMap[String, Long]()
      words.foreach { case (sym, f) =>
        var i = 0
        while (i < sym.length - 1) {
          counts.merge(sym(i) + " " + sym(i + 1), f, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) dry = true
      else {
        // highest count, ties by the smallest "a b" string — the
        // exact ORDER BY cnt DESC, pair LIMIT 1 the oracle replays
        var bestPair: String = null
        var bestCnt = -1L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > bestCnt ||
            (e.getValue == bestCnt && e.getKey < bestPair)) {
            bestPair = e.getKey; bestCnt = e.getValue
          }
        }
        val sp = bestPair.indexOf(' ')
        val (a, b) = (bestPair.substring(0, sp), bestPair.substring(sp + 1))
        merges += ((a, b))
        var w = 0
        while (w < words.length) {
          words(w) = (mergeOnce(words(w)._1, a, b), words(w)._2)
          w += 1
        }
      }
      r += 1
    }
    Result(merges.result(),
      wordFreqs.map(_._1).zip(words.map(_._1)).toMap)
  }
}

/** The apply side: segment a word by replaying the learned merges in
  * rank order (each merge left-to-right non-overlapping — identical
  * to the training pass, so in-vocabulary words reproduce their
  * training segmentation exactly). Serializable: the q100 expression
  * embeds one instance in the plan.
  */
final class BpeEncoder(val merges: Seq[(String, String)])
    extends Serializable {
  def segment(word: String): Array[String] = {
    var sym = word.toCharArray.map(_.toString)
    val it = merges.iterator
    while (it.hasNext && sym.length > 1) {
      val (a, b) = it.next()
      sym = BpeTrain.mergeOnce(sym, a, b)
    }
    sym
  }

  /** Space-joined segmentation (tokens carry no spaces, so the join
    * is injective) — the q100 oracle's comparison form.
    */
  def segmentString(word: String): String = segment(word).mkString(" ")

  /** BYTE-FALLBACK apply (GPT-2/SentencePiece shape): tokens the
    * training vocabulary can never cover — anything outside
    * `^[a-z]+$`, the training filter — segment into their UTF-8 BYTES
    * as `<0xNN>` units instead of passing through as one opaque unit.
    * Keeps the capped-word-table training shape while making the
    * token budget HONEST on mixed-script corpora: a CJK token is ~3
    * units per character to a byte-level trainer, not 1. In-vocab
    * (all-lowercase-alpha) words take the learned merges exactly as
    * [[segment]].
    */
  def segmentWithByteFallback(token: String): Array[String] =
    if (BpeEncoder.isTrainable(token)) segment(token)
    else {
      val bytes = token.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val out = new Array[String](bytes.length)
      var i = 0
      while (i < bytes.length) {
        out(i) = f"<0x${bytes(i) & 0xff}%02x>"
        i += 1
      }
      out
    }

  /** Space-joined [[segmentWithByteFallback]] (byte units contain no
    * spaces either, so the join stays injective).
    */
  def segmentTokenString(token: String): String =
    segmentWithByteFallback(token).mkString(" ")
}

object BpeEncoder {
  /** The training filter: only these words enter the (word, freq)
    * table, so only these can be segmented by merges — everything
    * else byte-falls-back.
    */
  def isTrainable(token: String): Boolean = {
    if (token.isEmpty) return false
    var i = 0
    while (i < token.length) {
      val c = token.charAt(i)
      if (c < 'a' || c > 'z') return false
      i += 1
    }
    true
  }
}
