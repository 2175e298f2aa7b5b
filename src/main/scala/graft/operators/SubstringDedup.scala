package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfns.TextFunctions

/** Cross-document exact-substring (duplicated-span) detection — the
  * span-level complement of the document-level dedup family
  * (MinHash/SimHash/winnowing score whole documents; this finds the
  * duplicated REGIONS inside them, the "exact substring dedup" pass of
  * LLM training-data pipelines à la Lee et al. 2022, *Deduplicating
  * Training Data Makes Language Models Better*, which removes repeated
  * 50-token spans rather than whole near-dup documents).
  *
  * Definition: an L-token window (position `p` covers tokens
  * `[p, p+L-1]`, 0-based) is *duplicated* when the exact same window
  * string occurs `minCount`+ times across the corpus — in other
  * documents or repeated inside the same one. A document's
  * *duplicated spans* are the maximal runs of tokens covered by
  * duplicated windows: windows at positions `p ≤ q` merge into one
  * span when `q ≤ p + L` (their coverage overlaps or is adjacent, so
  * the covered region is contiguous).
  *
  * Distributed shape, stage by stage:
  *
  *   1. **Window emit** — map-side off the token arrays via the
  *      codegen'd [[org.apache.spark.sql.graftfns.WordShingles]] in
  *      no-dedup mode + `posexplode` (array index = token position;
  *      no interpreted HOF in the hot loop).
  *   2. **Duplicate detection** — ONE count shuffle keyed by the
  *      window, with map-side partial aggregation. In `exact` mode
  *      the key is the window string itself (what the DuckDB oracle
  *      replicates); `hashed = true` is the 100 TB path — the shuffle
  *      key drops to the 8-byte `xxhash64` of the window, trading
  *      byte volume L·tokens → 8·tokens for a collision false-positive
  *      rate ≤ pairs·2⁻⁶⁴ (collisions can only ADD spans, never lose
  *      one — recall stays exact; SubstringDedupSpec pins
  *      hashed ≡ exact on testdata).
  *   3. **Occurrence join-back** — duplicated keys join back to the
  *      (doc, pos) occurrences. The duplicated-key side is typically
  *      ≪ the corpus (dup windows are the pathology, not the norm);
  *      sizes ride normal join estimation and AQE picks broadcast
  *      when it fits — no hint needed, and at adversarial duplication
  *      levels the sort-merge fallback is the right plan anyway.
  *   4. **Span merge** — classic gaps-and-islands per document:
  *      `lag` + running `sum` over a `Window.partitionBy(doc)`. The
  *      partition is ONE document's duplicated positions (bounded by
  *      its token count), never a corpus-wide ordering — safe at any
  *      corpus size.
  *
  * No collect, no corpus-sized driver state, no unbounded per-task
  * buffers. The whole pipeline is 2 shuffles (count, join) + the
  * per-doc window stage.
  *
  * Working columns are `__ssd_`-prefixed and the caller's id column
  * never collides with them (same lesson as KeyedPairs: `withColumn`
  * silently replaces same-named caller columns).
  */
object SubstringDedup {

  /** Duplicated spans per document: one row per maximal duplicated
    * run — (id, span_start, span_end) in 0-based token positions,
    * both ends inclusive. Documents without duplicated windows
    * contribute no rows ([[profile]] re-attaches them with zeros).
    *
    * @param toks     (id, token-array) relation — one row per doc
    * @param window   L, the window length in tokens (≥ 2; Lee et al.
    *                 use 50 on BPE tokens — pick relative to corpus
    *                 document length)
    * @param minCount occurrence threshold for "duplicated" (≥ 2)
    * @param hashed   shuffle xxhash64(window) instead of the window
    *                 string (scale mode; see class doc)
    */
  def spans(toks: DataFrame, idCol: String, toksCol: String, window: Int,
            minCount: Int = 2, hashed: Boolean = false): DataFrame = {
    val occ = dupOccurrences(toks, idCol, toksCol, window, minCount, hashed)
      .select(col("__ssd_id"), col("__ssd_pos"))
    mergeRuns(occ, window).select(
      col("__ssd_id").as(idCol), col("span_start"), col("span_end"))
  }

  /** Duplicated-window occurrences (__ssd_id, __ssd_pos, __ssd_first)
    * — stages 1–3 of the class doc, shared by [[spans]] and [[strip]].
    * `__ssd_first` marks the corpus-FIRST occurrence of the window's
    * key under (id, pos) ordering, computed as `min(struct)` inside
    * the SAME count shuffle (no extra corpus-wide window function, no
    * hot-key partition: viral windows aggregate map-side like any
    * other key).
    */
  private def dupOccurrences(toks: DataFrame, idCol: String, toksCol: String,
      window: Int, minCount: Int, hashed: Boolean): DataFrame = {
    require(window >= 2, s"window must be >= 2 tokens, got $window")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val wins = toks.select(
      col(idCol).as("__ssd_id"),
      posexplode(TextFunctions.shinglesAll(col(toksCol), window))
        .as(Seq("__ssd_pos", "__ssd_win")))
    val keyed =
      if (hashed) wins.select(col("__ssd_id"), col("__ssd_pos"),
        xxhash64(col("__ssd_win")).as("__ssd_key"))
      else wins.withColumnRenamed("__ssd_win", "__ssd_key")
    val dup = keyed.groupBy(col("__ssd_key"))
      .agg(count(lit(1)).as("__ssd_n"),
        min(struct(col("__ssd_id"), col("__ssd_pos"))).as("__ssd_min"))
      .filter(col("__ssd_n") >= minCount)
      .select(col("__ssd_key"), col("__ssd_min"))
    keyed.join(dup, "__ssd_key")
      .select(col("__ssd_id"), col("__ssd_pos"),
        (struct(col("__ssd_id"), col("__ssd_pos")) === col("__ssd_min"))
          .as("__ssd_first"))
  }

  /** Gaps-and-islands merge of window positions into maximal covered
    * runs — (__ssd_id, span_start, span_end), 0-based inclusive. The
    * window partition is ONE document's positions, never corpus-wide.
    */
  private def mergeRuns(occ: DataFrame, window: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("__ssd_id")).orderBy(col("__ssd_pos"))
    occ
      .withColumn("__ssd_prev", lag(col("__ssd_pos"), 1).over(byDoc))
      // a window further than L past the previous one leaves a gap in
      // the covered tokens -> new island
      .withColumn("__ssd_new",
        when(col("__ssd_prev").isNull ||
          col("__ssd_pos") > col("__ssd_prev") + window, 1L).otherwise(0L))
      .withColumn("__ssd_grp", sum(col("__ssd_new")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__ssd_id"), col("__ssd_grp"))
      .agg(min(col("__ssd_pos")).as("span_start"),
        (max(col("__ssd_pos")) + lit(window - 1)).as("span_end"))
      .select(col("__ssd_id"), col("span_start"), col("span_end"))
  }

  /** The REMOVAL pass over [[spans]]' detection (Lee et al. 2022 strip
    * duplicated spans from the corpus rather than just profiling them):
    * every input document comes back with the tokens of its removable
    * spans deleted (order preserved), as `toks_clean`.
    *
    * `keepFirst = true` (the default, and Lee et al.'s semantics —
    * the content must survive SOMEWHERE) exempts the corpus-first
    * occurrence of each duplicated window (minimal (id, pos)): the
    * first document to carry a boilerplate block keeps it, every later
    * carrier loses it, and a window repeated only inside one document
    * keeps its first repeat. `keepFirst = false` strips every
    * duplicated occurrence (the aggressive variant for boilerplate
    * that should survive nowhere).
    *
    * Removable spans are the maximal runs of removable window
    * positions — the same merge as [[spans]] — so partially-unique
    * edges survive: a window straddling the boundary of duplicated
    * and unique content occurs once corpus-wide and never strips its
    * tokens.
    *
    * Scale shape: identical to [[spans]] (the first-occurrence mark
    * rides the existing count shuffle as a `min(struct)`), plus one
    * doc-keyed join of the strip spans back to the corpus; the token
    * rewrite is a per-row array `filter` bounded by the document's
    * own length — no extra shuffle, no driver state.
    *
    * In `hashed` mode a 2⁻⁶⁴ key collision can REMOVE a span that
    * only collided into duplication (unlike [[spans]], where
    * collisions merely over-report) — the spec pins hashed ≡ exact on
    * real corpora; flip to exact mode where even that is too much.
    */
  def strip(toks: DataFrame, idCol: String, toksCol: String, window: Int,
            minCount: Int = 2, hashed: Boolean = false,
            keepFirst: Boolean = true): DataFrame = {
    val occ = dupOccurrences(toks, idCol, toksCol, window, minCount, hashed)
    val removable =
      (if (keepFirst) occ.filter(!col("__ssd_first")) else occ)
        .select(col("__ssd_id"), col("__ssd_pos"))
    val sp = mergeRuns(removable, window)
      .groupBy(col("__ssd_id"))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("__ssd_sp"))
    toks.join(sp, toks(idCol) === sp("__ssd_id"), "left")
      .select(col(idCol),
        when(col("__ssd_sp").isNull, col(toksCol)).otherwise(
          filter(col(toksCol), (t, i) =>
            !exists(col("__ssd_sp"),
              s => i >= s("s") && i <= s("e")))).as("toks_clean"))
  }

  /** Per-document duplication profile over [[spans]] — EVERY input
    * document, including clean ones: token count, duplicated-span
    * count, duplicated-token total, duplicated fraction (plain
    * double division — round for cross-engine display). This is the
    * table a curation pipeline filters/strips on ("drop docs > 80%
    * duplicated; strip spans from the rest").
    */
  def profile(toks: DataFrame, idCol: String, toksCol: String, window: Int,
              minCount: Int = 2, hashed: Boolean = false): DataFrame = {
    val sp = spans(toks, idCol, toksCol, window, minCount, hashed)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__ssd_spans"),
        sum(col("span_end") - col("span_start") + lit(1L)).as("__ssd_toks"))
    toks.select(col(idCol), size(col(toksCol)).cast("long").as("n_tokens"))
      .join(sp, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("__ssd_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("__ssd_toks"), lit(0L)).as("dup_tokens"),
        // 0/0 guard: an empty token array is a CLEAN document
        // (dup_frac 0.0), not NaN poisoning the curation filter
        when(col("n_tokens") > 0,
          coalesce(col("__ssd_toks"), lit(0L)).cast("double") /
            col("n_tokens")).otherwise(lit(0.0)).as("dup_frac"))
  }
}
