package org.apache.spark.sql.graftfns

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `warc_digest(payload)` — the WARC convention's labeled payload
  * digest: `sha1:` + RFC 4648 base32 (uppercase, unpadded; SHA-1's
  * 160 bits are exactly 32 base32 characters). This is the value
  * `WARC-Payload-Digest` carries in Common Crawl and every
  * wget/Heritrix crawl, i.e. the JOIN KEY between `revisit` records
  * and the stored response they deduplicate against — computed
  * natively (codegen, thread-local MessageDigest) because revisit
  * resolution evaluates it once per stored page over the full corpus.
  */
case class WarcDigest(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "warc_digest"

  override protected def nullSafeEval(input: Any): Any =
    WarcDigest.digest(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WarcDigest.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.digest($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WarcDigest {
  private val Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  // one digester per executor thread: getInstance-per-row would
  // dominate the kernel on short payloads
  private val sha1 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("SHA-1"))

  /** Row kernel, shared by eval and codegen. */
  def digest(payload: Array[Byte]): UTF8String =
    UTF8String.fromString(labeled(payload))

  /** `sha1:<base32>` of the payload bytes — the exact string a WARC
    * writer puts in `WARC-Payload-Digest` (fixture writers reuse it).
    */
  def labeled(payload: Array[Byte]): String = {
    val d = sha1.get()
    d.reset()
    "sha1:" + base32(d.digest(payload))
  }

  /** RFC 4648 base32, uppercase, unpadded — the WARC digest form (20
    * sha1 bytes = 32 chars exactly, so padding never arises there;
    * other lengths emit the unpadded partial final group).
    */
  def base32(bytes: Array[Byte]): String = {
    val out = new java.lang.StringBuilder((bytes.length * 8 + 4) / 5)
    var acc = 0L
    var nbits = 0
    var i = 0
    while (i < bytes.length) {
      acc = (acc << 8) | (bytes(i) & 0xffL)
      nbits += 8
      while (nbits >= 5) {
        out.append(Alphabet.charAt(((acc >>> (nbits - 5)) & 0x1f).toInt))
        nbits -= 5
      }
      i += 1
    }
    if (nbits > 0)
      out.append(Alphabet.charAt(((acc << (5 - nbits)) & 0x1f).toInt))
    out.toString
  }

  /** Column API. */
  def warcDigest(payload: Column): Column =
    ExpressionUtils.column(WarcDigest(ExpressionUtils.expression(payload)))
}
