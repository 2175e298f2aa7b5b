package org.apache.spark.sql.graftfns

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `html_text(payload, http_content_type)` — crawl-payload → clean
  * text, the step between WARC ingestion (q94) and every text
  * operator in the corpus family (dedup q24–q29, language-ID q32,
  * quality q33, tokenization q34, contamination q47/q59 all consume
  * `documents.text`; a raw crawl only has HTTP body BYTES). A native
  * codegen'd expression, not a UDF: this runs once per crawled page
  * over the full corpus — exactly the hot path where interpreted
  * per-row closures become the pipeline bottleneck (the
  * [[WordShingles]]/[[DotProduct]] justification; reference trace
  * rosbag2parquet README.md:2's query-enablement thesis extended to
  * the text pipeline of BASELINE.json).
  *
  * Deterministic extraction contract (the q95 oracle replicates it in
  * SQL on the pre-wrap text):
  *
  *  1. charset in WHATWG sniff order: a byte-order mark wins over
  *     everything ([[HtmlText.bomCharset]]); then the `charset=`
  *     parameter of the HTTP Content-Type (quoted or bare,
  *     case-insensitive); then the HTML5 `<meta>` prescan of the
  *     first 1024 bytes (comment-skipping, attribute-parsed — see
  *     [[HtmlText.sniffMeta]]); UTF-8 otherwise. Malformed byte
  *     sequences decode to U+FFFD (REPLACE) — a 100 TB scan must not
  *     lose a shard to one mojibake page.
  *  2. drop `<!-- … -->` comments, `<script>`/`<style>` elements WITH
  *     their contents (case-insensitive, unterminated → drop to end),
  *     and every remaining tag; each removal emits one space so text
  *     separated only by markup never fuses.
  *  3. decode entities AFTER tag removal (an encoded `&lt;` must not
  *     re-parse as markup): the five named XML entities plus `nbsp`,
  *     and numeric `&#NNN;` / `&#xHH;` forms; anything unknown or
  *     unterminated stays literal.
  *  4. collapse runs of `[\t\n\f\r ]` to one space and trim — the
  *     exact RE2/DuckDB `\s` class, so `trim(regexp_replace(t, '\s+',
  *     ' ', 'g'))` is the oracle-side equivalent.
  */
case class HtmlText(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "html_text"

  // a null content type is a MISSING HEADER, not a missing row —
  // only a null payload nulls the result
  override def nullable: Boolean = left.nullable

  override def eval(input: InternalRow): Any = {
    val p = left.eval(input)
    if (p == null) null
    else HtmlText.extract(p.asInstanceOf[Array[Byte]],
      right.eval(input).asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val cls = HtmlText.getClass.getName.stripSuffix("$")
    val utf8 = classOf[UTF8String].getName
    ev.copy(code = code"""
      ${l.code}
      boolean ${ev.isNull} = ${l.isNull};
      $utf8 ${ev.value} = null;
      if (!${ev.isNull}) {
        ${r.code}
        ${ev.value} = $cls.extract(${l.value},
          ${r.isNull} ? null : ${r.value});
      }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object HtmlText {

  /** Row kernel, shared verbatim by eval and codegen. Charset
    * precedence mirrors the WHATWG encoding-sniffing order a browser
    * applies: a byte-order mark wins over EVERYTHING (spec step 1 —
    * a BOM'd UTF-8 page served with a wrong `charset=iso-8859-1`
    * header is a common real-web misconfiguration and must decode as
    * its bytes say, not as the header lies); then the transport (HTTP
    * Content-Type charset param); then a `<meta>` declaration in the
    * document prescan window; UTF-8 as the final fallback. A large
    * real-web fraction declares its charset ONLY in `<meta>` —
    * header-only detection mis-decodes those pages.
    */
  def extract(payload: Array[Byte], contentType: UTF8String): UTF8String = {
    val cs = bomCharset(payload)
      .orElse(charsetOf(if (contentType == null) null else contentType.toString))
      .getOrElse(sniffMeta(payload))
    val html = decode(payload, cs)
    UTF8String.fromString(collapse(decodeEntities(stripMarkup(html))))
  }

  /** `charset=` parameter of a Content-Type, bare or quoted; None
    * when absent / unknown / unsupported (→ the caller sniffs).
    */
  private[graftfns] def charsetOf(contentType: String): Option[Charset] = {
    if (contentType != null) {
      val lower = contentType.toLowerCase(java.util.Locale.ROOT)
      val at = lower.indexOf("charset=")
      if (at >= 0) {
        var e = at + 8
        while (e < lower.length && lower.charAt(e) != ';' &&
          !Character.isWhitespace(lower.charAt(e))) e += 1
        val name = lower.substring(at + 8, e)
          .stripPrefix("\"").stripSuffix("\"")
        if (name.nonEmpty) {
          try return Some(Charset.forName(name))
          catch { case _: Exception => () } // unknown → sniff fallback
        }
      }
    }
    None
  }

  /** HTML5 prescan window: the spec's algorithm examines the first
    * 1024 bytes for a `<meta>` declaration.
    */
  private val PrescanBytes = 1024

  /** Byte-order-mark detection (UTF-8 / UTF-16LE / UTF-16BE) — the
    * WHATWG algorithm's step 1, consulted before the header.
    */
  private[graftfns] def bomCharset(payload: Array[Byte]): Option[Charset] = {
    val n = payload.length
    if (n >= 3 && (payload(0) & 0xff) == 0xef && (payload(1) & 0xff) == 0xbb &&
      (payload(2) & 0xff) == 0xbf) Some(StandardCharsets.UTF_8)
    else if (n >= 2 && (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xfe)
      Some(StandardCharsets.UTF_16LE)
    else if (n >= 2 && (payload(0) & 0xff) == 0xfe && (payload(1) & 0xff) == 0xff)
      Some(StandardCharsets.UTF_16BE)
    else None
  }

  /** `<meta>` charset detection for a header without one — the HTML5
    * prescan over the first 1024 bytes (scanned as ASCII — every
    * charset this sniff can RETURN is an ASCII-compatible superset,
    * BOM-marked docs never reach here): `<!--...-->` comments are
    * SKIPPED (a commented-out legacy declaration must not win, per the
    * spec's comment rule), and each `<meta>` tag's ATTRIBUTES are
    * parsed (quote-aware) rather than substring-matched — only a
    * `charset` attribute, or the `charset=` parameter of a `content`
    * attribute on a tag that also carries `http-equiv`, counts (a
    * `charset=` inside an unrelated attribute like a description's
    * content must not). UTF-8 otherwise.
    */
  private[graftfns] def sniffMeta(payload: Array[Byte]): Charset = {
    val n = payload.length
    val win = new String(payload, 0, math.min(n, PrescanBytes),
      StandardCharsets.US_ASCII).toLowerCase(java.util.Locale.ROOT)
    var i = 0
    while (i < win.length) {
      if (win.startsWith("<!--", i)) {
        val e = win.indexOf("-->", i + 4)
        i = if (e < 0) win.length else e + 3
      } else if (win.startsWith("<meta", i) &&
          (i + 5 >= win.length || !Character.isLetterOrDigit(win.charAt(i + 5)))) {
        val end = tagEnd(win, i + 5)
        metaTagCharset(win.substring(i + 5, end)) match {
          case Some(cs) => return cs
          case None => ()
        }
        i = end + 1
      } else i += 1
    }
    StandardCharsets.UTF_8
  }

  /** First '>' at or after `from` that is not inside a quoted
    * ATTRIBUTE VALUE (string length when none — unterminated drops to
    * end). The HTML5 tokenizer's attribute-value states consume '>'
    * as value content, so `content="a > b"` must neither truncate the
    * tag nor resume the outer scan mid-tag; but only quotes in VALUE
    * position (first non-space after '=') delimit — a stray quote in
    * free-standing text after a bare '<' is content, exactly like the
    * tokenizer never entering a value state without '='. Shared by
    * the meta prescan and [[stripMarkup]]'s generic-tag branch so the
    * sniff and the strip can never disagree about where a tag ends.
    */
  private[graftfns] def tagEnd(s: String, from: Int): Int = {
    var i = from
    var eqPending = false // saw '=', scanning whitespace toward the value
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '>') return i
      else if (c == '=') { eqPending = true; i += 1 }
      else if (Character.isWhitespace(c)) i += 1 // `attr = "v"` is legal
      else if ((c == '"' || c == '\'') && eqPending) {
        val e = s.indexOf(c, i + 1)
        i = if (e < 0) s.length else e + 1
        eqPending = false
      } else { eqPending = false; i += 1 }
    }
    s.length
  }

  /** Charset of one `<meta>` tag's attribute text, per the prescan's
    * attribute rules; None when the tag declares nothing usable.
    */
  private def metaTagCharset(attrs: String): Option[Charset] = {
    // quote-aware attribute scan: name [= value], values bare or quoted
    var i = 0
    var charsetAttr: String = null
    var httpEquiv: String = null
    var content: String = null
    while (i < attrs.length) {
      while (i < attrs.length && (Character.isWhitespace(attrs.charAt(i)) ||
        attrs.charAt(i) == '/')) i += 1
      val ns = i
      while (i < attrs.length && !Character.isWhitespace(attrs.charAt(i)) &&
        attrs.charAt(i) != '=' && attrs.charAt(i) != '/') i += 1
      val name = attrs.substring(ns, i)
      while (i < attrs.length && Character.isWhitespace(attrs.charAt(i))) i += 1
      var value = ""
      if (i < attrs.length && attrs.charAt(i) == '=') {
        i += 1
        while (i < attrs.length && Character.isWhitespace(attrs.charAt(i))) i += 1
        if (i < attrs.length && (attrs.charAt(i) == '"' || attrs.charAt(i) == '\'')) {
          val q = attrs.charAt(i)
          val e = attrs.indexOf(q, i + 1)
          if (e < 0) { value = attrs.substring(i + 1); i = attrs.length }
          else { value = attrs.substring(i + 1, e); i = e + 1 }
        } else {
          val vs = i
          while (i < attrs.length && !Character.isWhitespace(attrs.charAt(i)))
            i += 1
          value = attrs.substring(vs, i)
        }
      }
      if (name == "charset") charsetAttr = value
      else if (name == "http-equiv") httpEquiv = value
      else if (name == "content") content = value
    }
    val declared: String =
      if (charsetAttr != null && charsetAttr.nonEmpty) charsetAttr
      else if (httpEquiv == "content-type" && content != null) {
        val at = content.indexOf("charset=")
        if (at < 0) null
        else {
          var s = at + 8
          if (s < content.length &&
            (content.charAt(s) == '"' || content.charAt(s) == '\'')) s += 1
          var e = s
          while (e < content.length && content.charAt(e) != '"' &&
            content.charAt(e) != '\'' && content.charAt(e) != ';' &&
            !Character.isWhitespace(content.charAt(e))) e += 1
          content.substring(s, e)
        }
      } else null
    if (declared == null || declared.isEmpty) None
    else
      try {
        val cs = Charset.forName(declared)
        // the prescan cannot have read a UTF-16 document as ASCII; a
        // meta claiming utf-16 means the bytes are really an ASCII
        // superset (the HTML5 rule: treat as UTF-8)
        Some(if (cs == StandardCharsets.UTF_16LE ||
          cs == StandardCharsets.UTF_16BE ||
          cs.name.startsWith("UTF-16")) StandardCharsets.UTF_8
        else cs)
      } catch { case _: Exception => None } // unknown name: keep scanning
  }

  /** Bytes → string with U+FFFD replacement on malformed sequences.
    * A leading U+FEFF is a byte-order MARK, not content (it decodes
    * to a character under utf-8/utf-16 whether the charset came from
    * the header or the sniff) — dropped, as browsers do.
    */
  private[graftfns] def decode(bytes: Array[Byte], cs: Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val s = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val last = s.length - needle.length
    var i = math.max(from, 0)
    while (i <= last) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** HTML5 tag-name boundary: a name ends only at whitespace, '/',
    * '>' or end-of-input — `<styleguide>` / `<scripted-widget>` are
    * DIFFERENT elements, not style/script, and their text content
    * must survive the strip.
    */
  private def nameBoundary(s: String, idx: Int): Boolean =
    idx >= s.length || {
      val c = s.charAt(idx)
      c == '>' || c == '/' || c == ' ' || c == '\t' || c == '\n' ||
        c == '\f' || c == '\r'
    }

  /** One pass: comments, script/style elements (with contents), and
    * tags drop; each removed region emits a single space.
    */
  private[graftfns] def stripMarkup(html: String): String = {
    val n = html.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        sb.append(' ')
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (html.regionMatches(true, i, "<script", 0, 7) &&
            nameBoundary(html, i + 7)) {
          i = skipElement(html, i, "</script")
        } else if (html.regionMatches(true, i, "<style", 0, 6) &&
            nameBoundary(html, i + 6)) {
          i = skipElement(html, i, "</style")
        } else {
          // quote-aware (shared tagEnd): a '>' inside a quoted
          // attribute value must not end the tag and leak the rest of
          // the tag's attribute text into the extracted output
          val e = tagEnd(html, i + 1)
          i = if (e >= n) n else e + 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Past the close of `endTag` (its trailing '>'), or end-of-input
    * for an unterminated element — raw script/style content must
    * never leak into text. Only a BOUNDARY-valid close counts:
    * `</scriptx>` is inert script content, per the HTML5 rule.
    */
  private def skipElement(html: String, open: Int, endTag: String): Int = {
    val n = html.length
    var from = open + 1
    var result = -1
    while (result < 0) {
      val at = indexOfIgnoreCase(html, endTag, from)
      if (at < 0) result = n
      else if (nameBoundary(html, at + endTag.length)) {
        val gt = html.indexOf('>', at + endTag.length)
        result = if (gt < 0) n else gt + 1
      } else from = at + 1
    }
    result
  }

  /** Named XML entities + nbsp + numeric forms; unknown or
    * unterminated (no ';' within 10 chars) stays literal.
    */
  private[graftfns] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var advanced = false
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val cp = entityCodepoint(s.substring(i + 1, semi))
          if (cp >= 0) { sb.appendCodePoint(cp); i = semi + 1; advanced = true }
        }
      }
      if (!advanced) { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Codepoint of an entity body (between '&' and ';'), or -1. */
  private def entityCodepoint(body: String): Int = body match {
    case "amp" => '&'
    case "lt" => '<'
    case "gt" => '>'
    case "quot" => '"'
    case "apos" => '\''
    case "nbsp" => 0xA0
    case _ if body.startsWith("#") =>
      val (digits, radix) =
        if (body.length > 2 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
          (body.substring(2), 16)
        else (body.substring(1), 10)
      try {
        val cp = Integer.parseInt(digits, radix)
        if (cp >= 0 && cp <= 0x10FFFF &&
          !(cp >= 0xD800 && cp <= 0xDFFF)) cp else -1
      } catch { case _: NumberFormatException => -1 }
    case _ => -1
  }

  /** Collapse runs of the RE2 `\s` class `[\t\n\f\r ]` to one space
    * and trim — `trim(regexp_replace(t, '\s+', ' ', 'g'))` in
    * RE2-regex SQL engines. Deliberately NOT Character.isWhitespace:
    * vertical tab (U+000B) and the Unicode space family are not in RE2's `\s`, and
    * the oracle side must be expressible there.
    */
  private[graftfns] def collapse(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pending = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f')
        pending = true
      else {
        if (pending && sb.length > 0) sb.append(' ')
        sb.append(c)
        pending = false
      }
      i += 1
    }
    sb.toString
  }

  /** Column API. */
  def htmlText(payload: Column, contentType: Column): Column =
    ExpressionUtils.column(HtmlText(
      ExpressionUtils.expression(payload),
      ExpressionUtils.expression(contentType)))
}
