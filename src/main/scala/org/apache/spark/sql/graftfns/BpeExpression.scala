package org.apache.spark.sql.graftfns

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_segment(word)` with a learned merge table — the APPLY side of
  * BPE vocabulary induction ([[graft.operators.BpeTrain]]): replays
  * the merges in rank order and returns the space-joined subword
  * segmentation. The merge table is a constructor parameter, so it
  * serializes WITH the plan to every executor (the in-list shape —
  * no side channel, cluster-safe) and the expression stays codegen'd:
  * the encoder is attached as a codegen reference object, one virtual
  * call per row.
  */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_segment"

  @transient private lazy val encoder = new graft.operators.BpeEncoder(merges)

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      encoder.segmentString(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val enc = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[graft.operators.BpeEncoder].getName)
    val utf8 = classOf[UTF8String].getName
    defineCodeGen(ctx, ev, c =>
      s"$utf8.fromString($enc.segmentString($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeSegment {
  /** Column API. */
  def bpeSegment(word: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(
      BpeSegment(ExpressionUtils.expression(word), merges))

  /** Column API for the byte-fallback apply. */
  def bpeSegmentBytes(token: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(
      BpeSegmentBytes(ExpressionUtils.expression(token), merges))
}

/** `bpe_segment_bytes(token)` — [[BpeSegment]] with the GPT-2-style
  * byte fallback ([[graft.operators.BpeEncoder.segmentWithByteFallback]]):
  * trainable (`^[a-z]+$`) tokens replay the merges, everything else
  * segments into `<0xNN>` UTF-8 byte units — the apply form whose
  * piece counts are honest on mixed-script corpora (q107).
  */
case class BpeSegmentBytes(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_segment_bytes"

  @transient private lazy val encoder = new graft.operators.BpeEncoder(merges)

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      encoder.segmentTokenString(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val enc = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[graft.operators.BpeEncoder].getName)
    val utf8 = classOf[UTF8String].getName
    defineCodeGen(ctx, ev, c =>
      s"$utf8.fromString($enc.segmentTokenString($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
