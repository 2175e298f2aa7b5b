package graft.operators

/** Corpus-derived blocking/banding knobs for the LSH dedup family
  * (MinHash bands, SimHash pigeonhole blocks, winnowing window).
  *
  * Round-5 review flagged that these were static constants tuned for
  * the ~sf0.1 corpus shape: outputs stayed correct, plans stayed
  * bounded, but bucket POPULATIONS grow linearly with corpus size and
  * pair work within a bucket grows quadratically. This object is the
  * one place that math lives; the q28/q29/q63 entries derive their
  * scheme from the (cached) corpus document count instead of
  * hard-coding one.
  *
  * The underlying trades, with the standard published math:
  *
  * - MinHash banding (b bands × r rows): candidate probability at
  *   Jaccard s is 1-(1-s^r)^b — an S-curve with threshold ≈ (1/b)^(1/r).
  *   Raising r pushes the threshold up (fewer moderately-similar
  *   candidate pairs to confirm-and-reject — at corpus scale those
  *   dominate candidate volume); raising b restores recall at the
  *   target threshold. Cost: signature length b·r longs per doc.
  * - SimHash pigeonhole generalized to block COMBINATIONS (Manku et
  *   al., WWW'07 §3): split 64 bits into B equal blocks and key
  *   candidate buckets on every combination of j blocks. Two docs
  *   within hamming distance h differ in at most h blocks, so whenever
  *   B - h >= j some combination is clean on both sides — recall for
  *   the hamming<=3 confirm is GUARANTEED while B - j >= 3. Key width
  *   is j·(64/B) bits: choosing it >= log2(N)+4 keeps the expected
  *   bucket population ~1/16 doc under uniform hashing, so pair work
  *   stays near-linear. The price is C(B,j) keys per doc — a LINEAR
  *   shuffle-volume factor traded against the QUADRATIC in-bucket
  *   blowup of narrow keys.
  * - Winnowing (Schleimer et al., SIGMOD'03): window w guarantees any
  *   shared run of >= w+n-1 tokens yields a shared fingerprint, at
  *   expected fingerprint density 2/(w+1). Larger corpora take a larger
  *   w: the inverted index shrinks ~linearly in w while the guarantee
  *   degrades gracefully to "longer matches only".
  */
object LshTuning {

  /** MinHash signature/banding scheme. recallAt(s) = 1-(1-s^r)^b. */
  final case class MinHashScheme(numHashes: Int, bands: Int, rows: Int) {
    require(numHashes == bands * rows, s"numHashes=$numHashes must equal bands*rows=${bands * rows}")
    def recallAt(s: Double): Double = 1.0 - math.pow(1.0 - math.pow(s, rows), bands)
  }

  /** Chosen so recall at the 0.5-Jaccard confirm threshold never drops
    * below the small-corpus scheme while the S-curve threshold rises:
    *   (16, 8×2): recall@0.5 = 0.90, @0.3 = 0.53   (small corpora)
    *   (32, 16×2): recall@0.5 = 0.99, @0.3 = 0.78  (more bands first —
    *     recall headroom is cheap while candidate volume is small)
    *   (48, 16×3): recall@0.5 = 0.88, @0.3 = 0.35  (threshold pushed up:
    *     at ~1e7+ docs the s∈[0.2,0.4) pair mass is what floods the
    *     confirm stage, so r=3 suppresses it ~2× at equal bands)
    */
  def minhashScheme(corpusDocs: Long): MinHashScheme =
    if (corpusDocs <= 100000L) MinHashScheme(16, 8, 2)
    else if (corpusDocs <= 10000000L) MinHashScheme(32, 16, 2)
    else MinHashScheme(48, 16, 3)

  /** SimHash candidate blocking: B blocks, buckets keyed on every
    * j-combination of blocks. Guarantee: full recall for hamming<=3
    * while blocks - blocksPerKey >= 3 (enforced by the pair generator).
    */
  final case class SimHashBlocking(blocks: Int, blocksPerKey: Int) {
    require(64 % blocks == 0 && blocks >= 2, s"blocks must divide 64, got $blocks")
    require(blocksPerKey >= 1 && blocks - blocksPerKey >= 3,
      s"hamming<=3 recall needs blocks-blocksPerKey >= 3, got ($blocks,$blocksPerKey)")
    def keyBits: Int = blocksPerKey * (64 / blocks)
    def keysPerDoc: Int = combinations(blocks, blocksPerKey)
  }

  private def combinations(n: Int, k: Int): Int =
    (1 to k).foldLeft(1L)((acc, i) => acc * (n - i + 1) / i).toInt

  /** Key width tracks log2(N): 16-bit keys carry a ~65k-doc corpus at
    * ~1 doc/bucket; past that, (8,3) widens keys to 24 bits at 56
    * keys/doc, and (8,4) to 32 bits at 70 keys/doc. (8,2) is never
    * chosen: same 16-bit key width as (4,1) but 7× the shuffle volume,
    * and measurably worse in practice — correlated 8-bit half-slices
    * collide into hot combo buckets (162s vs 10s for (8,1) at sf0.1).
    * It is exercised only in the fixture-scale equality specs.
    */
  def simhashBlocking(corpusDocs: Long): SimHashBlocking =
    if (corpusDocs <= 200000L) SimHashBlocking(4, 1)
    else if (corpusDocs <= 30000000L) SimHashBlocking(8, 3)
    else SimHashBlocking(8, 4)

  /** Winnowing window: density 2/(w+1) fingerprints/token; the minimum
    * guaranteed-detectable match length is w+n-1 tokens.
    */
  def winnowWindow(corpusDocs: Long): Int =
    if (corpusDocs <= 100000L) 4
    else if (corpusDocs <= 10000000L) 6
    else 8

  /** Per-task member cap for KeyedPairs expansion. NOT corpus-derived
    * by population (the block split already bounds per-task work at
    * cap² regardless of N); it grows one step at mega-corpus scale so
    * the number of split tasks for pervasive hot buckets stays within
    * scheduler-friendly bounds (cap² pair evaluations per task: 1M at
    * 1024, 4M at 2048 — both seconds-scale tasks).
    */
  def pairCap(corpusDocs: Long): Int =
    if (corpusDocs <= 10000000L) 1024 else 2048
}
