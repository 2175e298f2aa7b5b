package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Materialize a sequence-packing assignment (q66/q101's
  * concat-and-chunk layout) into the FIXED-LENGTH token-id rows a
  * trainer actually reads — the last step of the curation pipeline:
  * corpus → tokenize → pack → shards. Each output row is one training
  * sequence:
  *
  *   - `pack_id`   — the sequence's index in the global token order;
  *   - `input_ids` — exactly `seqLen` token ids: the concatenated
  *     document stream's slice [pack_id·L, (pack_id+1)·L), the final
  *     partial sequence padded with `padId`;
  *   - `n_real`    — how many leading ids are real (== seqLen for all
  *     but the last pack);
  *   - `doc_spans` — (doc_id, start, len) per contributing document,
  *     in-pack order: the LOSSLESS inverse, letting any consumer (and
  *     the q106 oracle) reassemble exactly which tokens belong to
  *     which document — attention-mask / boundary-loss construction
  *     downstream needs precisely this.
  *
  * Scale shape — one pass, no driver tokens: the assignment is
  * [[PrefixSum]]'s two-phase scan (one range shuffle; the driver
  * holds one long per partition, never token data); each document
  * then SPLITS map-side into its per-pack slices (a document spans
  * ⌈n/L⌉+1 packs at most, and the split is a codegen slice, not an
  * explode of tokens); one shuffle on `pack_id` groups the slices,
  * each group bounded at `seqLen` ids. Write the result with any
  * columnar sink (`.write.parquet(...)` — the trainer-shard layout).
  *
  * Determinism: docs are packed in `docId` order (callers make it
  * unique); `sort_array` pins in-pack span order, so replays are
  * byte-identical.
  */
object PackedShards {

  /** @param df     one row per document
    * @param docId  unique total-order key (the packing order)
    * @param ids    array column of token ids (long)
    * @param seqLen tokens per training sequence
    * @param padId  filler for the final partial sequence
    */
  def packs(df: DataFrame, docId: Column, ids: Column, seqLen: Int,
      padId: Long = 0L): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    Seq("__pk_doc", "__pk_ids", "__pk_n", "__pk_start").foreach { c =>
      require(!df.columns.contains(c),
        s"input may not use the reserved column name $c")
    }
    val L = lit(seqLen.toLong)
    val base = df.select(docId.as("__pk_doc"), ids.as("__pk_ids"))
      .withColumn("__pk_n", size(col("__pk_ids")).cast("long"))
      // zero-token docs occupy no slots; they stay reconstructible
      // from the assignment (their tok_start is the next doc's)
      .filter(col("__pk_n") > 0)
    val started = PrefixSum.exclusive(base, Seq(col("__pk_doc")),
      col("__pk_n"), "__pk_start")
    val spans = started
      .select(col("__pk_doc"), col("__pk_ids"), col("__pk_n"),
        col("__pk_start"),
        explode(sequence(
          expr(s"__pk_start div $seqLen"),
          expr(s"(__pk_start + __pk_n - 1) div $seqLen"))).as("pack_id"))
      .withColumn("__pk_gs", greatest(col("__pk_start"), col("pack_id") * L))
      .withColumn("__pk_ge",
        least(col("__pk_start") + col("__pk_n"), (col("pack_id") + lit(1L)) * L))
      .select(col("pack_id"), col("__pk_doc"),
        (col("__pk_gs") - col("pack_id") * L).cast("int").as("__pk_off"),
        slice(col("__pk_ids"),
          (col("__pk_gs") - col("__pk_start") + lit(1L)).cast("int"),
          (col("__pk_ge") - col("__pk_gs")).cast("int")).as("__pk_slice"))
    spans.groupBy(col("pack_id"))
      .agg(sort_array(collect_list(struct(
        col("__pk_off").as("start"), col("__pk_doc").as("doc_id"),
        col("__pk_slice").as("ids")))).as("__pk_sp"))
      .select(col("pack_id"),
        flatten(transform(col("__pk_sp"), s => s("ids"))).as("__pk_real"),
        transform(col("__pk_sp"), s =>
          struct(s("doc_id").as("doc_id"), s("start").as("start"),
            size(s("ids")).as("len"))).as("doc_spans"))
      .select(col("pack_id"),
        concat(col("__pk_real"),
          array_repeat(lit(padId),
            (lit(seqLen) - size(col("__pk_real"))).cast("int")))
          .as("input_ids"),
        size(col("__pk_real")).as("n_real"),
        col("doc_spans"))
  }

  /** Reassemble the per-document packing assignment from written
    * shards — the lossless-inverse check (q106's oracle gate):
    * (doc_id, n_tok, pack_id, pack_offset) exactly as the q66/q101
    * assignment computed them, plus a `contiguous` gate column (the
    * document's spans tile an unbroken token interval) that a
    * misplaced middle span would break even when the sums survive.
    */
  def reassemble(shards: DataFrame, seqLen: Int): DataFrame = {
    val L = lit(seqLen.toLong)
    shards.select(col("pack_id"), explode(col("doc_spans")).as("__pk_s"))
      .select(col("pack_id"),
        col("__pk_s.doc_id").as("doc_id"),
        (col("pack_id") * L + col("__pk_s.start")).as("__pk_abs"),
        col("__pk_s.len").cast("long").as("__pk_len"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__pk_len")).as("n_tok"),
        min(col("__pk_abs")).as("__pk_ts"),
        max(col("__pk_abs") + col("__pk_len")).as("__pk_te"))
      .select(col("doc_id"), col("n_tok"),
        expr(s"__pk_ts div $seqLen").as("pack_id"),
        pmod(col("__pk_ts"), L).as("pack_offset"),
        (col("__pk_te") - col("__pk_ts") === col("n_tok")).as("contiguous"))
  }
}
