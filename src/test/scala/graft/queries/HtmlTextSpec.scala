package graft.queries

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfns.HtmlText
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkTestBase

/** html_text (native codegen'd crawl-payload → clean-text) vs an
  * independent interpreted regex reference, plus charset decode and
  * malformed-markup goldens.
  */
class HtmlTextSpec extends SparkTestBase {

  private def extract(html: String, ct: String = "text/html"): String = {
    val out = HtmlText.extract(html.getBytes(StandardCharsets.UTF_8),
      if (ct == null) null else UTF8String.fromString(ct))
    out.toString
  }

  /** Independent reference: regex pipeline over the decoded string.
    * Agrees with the kernel on html without cross-construct overlaps
    * (a comment opener inside a script body etc. — the generator
    * below never produces those; explicit goldens pin the kernel's
    * document-order behavior there).
    */
  private def refExtract(html: String): String = {
    var s = html
    s = s.replaceAll("(?s)<!--.*?-->", " ")
    // name boundary = HTML5's: whitespace, '/' or '>' — NOT \b (which
    // would treat <script-foo> as a script element)
    s = s.replaceAll("(?si)<script(?=[\\t\\n\\f\\r />]).*?</script(?=[\\t\\n\\f\\r />])[^>]*>", " ")
    s = s.replaceAll("(?si)<style(?=[\\t\\n\\f\\r />]).*?</style(?=[\\t\\n\\f\\r />])[^>]*>", " ")
    s = s.replaceAll("(?s)<[^>]*>", " ")
    val m = java.util.regex.Pattern
      .compile("&(#[xX]?[0-9a-fA-F]+|[a-zA-Z]+);").matcher(s)
    val sb = new StringBuffer
    while (m.find()) {
      val body = m.group(1)
      val rep: Option[Int] = body match {
        case "amp" => Some('&')
        case "lt" => Some('<')
        case "gt" => Some('>')
        case "quot" => Some('"')
        case "apos" => Some('\'')
        case "nbsp" => Some(0xA0)
        case b if b.startsWith("#") && b.length <= 9 =>
          val (d, r) = if (b.length > 1 && (b.charAt(1) | 0x20) == 'x')
            (b.substring(2), 16) else (b.substring(1), 10)
          try {
            val cp = Integer.parseInt(d, r)
            if (cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF)) Some(cp)
            else None
          } catch { case _: NumberFormatException => None }
        case _ => None
      }
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(
        rep.map(cp => new String(Character.toChars(cp))).getOrElse(m.group(0))))
    }
    m.appendTail(sb)
    sb.toString.replaceAll("[\\t\\n\\f\\r ]+", " ")
      .replaceAll("^ | $", "")
  }

  test("matches the interpreted regex reference on generated html") {
    val rng = new scala.util.Random(41)
    val words = Seq("alpha", "a&b", "1<2", "x>y", "it's", "\"quoted\"",
      "tab\there", "line\nbreak", "  padded  ", "ñandú", "&amp;", "&#65;",
      "&bogus;", "lone & ampersand", "semi;colon")
    def text() = Seq.fill(1 + rng.nextInt(6))(
      words(rng.nextInt(words.size))).mkString(" ")
    def escaped() = text()
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val docs = (0 until 250).map { _ =>
      val sb = new StringBuilder
      sb.append("<html><head>")
      if (rng.nextBoolean()) sb.append("<title>").append(escaped()).append("</title>")
      if (rng.nextBoolean())
        sb.append("<style media=\"all\">p { content: \"x\" } b > i {}</style>")
      if (rng.nextBoolean())
        sb.append("<SCRIPT type=\"module\">if (a < b && c > d) e(\"</p>\");</SCRIPT>")
      sb.append("</head><body>")
      (0 until 1 + rng.nextInt(4)).foreach { _ =>
        rng.nextInt(4) match {
          case 0 => sb.append("<p class=\"t\">").append(escaped()).append("</p>")
          case 1 => sb.append("<!-- ").append(escaped()).append(" -->")
          case 2 => sb.append(escaped()).append("<br/>")
          case _ => sb.append("<div><span>").append(escaped())
            .append("</span></div>")
        }
      }
      sb.append("</body></html>")
      sb.toString
    }
    docs.zipWithIndex.foreach { case (html, i) =>
      assert(extract(html) === refExtract(html), s"doc $i: $html")
    }
    // the DataFrame (codegen) path returns the identical bytes
    val schema = StructType(Seq(
      StructField("payload", BinaryType), StructField("ct", StringType)))
    val rows = docs.map(h => Row(h.getBytes(StandardCharsets.UTF_8),
      "text/html; charset=utf-8"))
    val got = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), schema)
      .select(HtmlText.htmlText(col("payload"), col("ct")).as("t"))
      .collect().map(_.getString(0))
    assert(got.toSeq === docs.map(refExtract),
      "codegen path must be bit-equal to the interpreted reference")
  }

  test("charset handling: parameter parse, multi-byte decode, fallbacks") {
    val body = "<p>café €5</p>"
    assert(extract(body, "text/html; charset=utf-8") === "café €5")
    // utf-16le: genuinely different bytes
    val le = HtmlText.extract(body.getBytes("UTF-16LE"),
      UTF8String.fromString("text/html; charset=utf-16le")).toString
    assert(le === "café €5")
    // iso-8859-1: é is one byte 0xE9
    val latin = HtmlText.extract(body.getBytes("ISO-8859-1"),
      UTF8String.fromString("text/html; charset=iso-8859-1")).toString
    assert(latin.startsWith("café"), s"latin-1 decode: $latin")
    // quoted parameter form
    assert(extract("<p>ok</p>", "text/html; charset=\"utf-8\"") === "ok")
    // unknown charset, absent parameter, null content type → utf-8
    assert(extract("<p>ok</p>", "text/html; charset=klingon") === "ok")
    assert(extract("<p>ok</p>", "text/html") === "ok")
    assert(extract("<p>ok</p>", null) === "ok")
    // malformed utf-8 decodes to U+FFFD, never throws
    val bad = Array[Byte]('<', 'p', '>', 0xC3.toByte, '<', '/', 'p', '>')
    assert(HtmlText.extract(bad, null).toString === "�")
  }

  test("charset sniffing: BOM, meta charset, http-equiv, prescan window") {
    def sniffed(bytes: Array[Byte]): String =
      HtmlText.extract(bytes, UTF8String.fromString("text/html")).toString
    val body = "<html><head><meta charset=\"iso-8859-1\"></head>" +
      "<body><p>café</p></body></html>"
    // header carries no charset → the meta declaration decides
    assert(sniffed(body.getBytes("ISO-8859-1")) === "café")
    // http-equiv form, single quotes, charset nested in content=
    val he = "<html><head><meta http-equiv='Content-Type' " +
      "content='text/html; charset=iso-8859-1'></head><body>café</body></html>"
    assert(sniffed(he.getBytes("ISO-8859-1")) === "café")
    // BOMs outrank meta and decode without any declaration at all
    val plain = "<p>café €5</p>"
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ plain.getBytes("UTF-16LE")
    assert(sniffed(le) === "café €5")
    val be = Array[Byte](0xFE.toByte, 0xFF.toByte) ++ plain.getBytes("UTF-16BE")
    assert(sniffed(be) === "café €5")
    val u8 = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      plain.getBytes("UTF-8")
    assert(sniffed(u8) === "café €5", "utf-8 BOM is a mark, not content")
    // a leading BOM never leaks into the text even when the header
    // declares the charset
    assert(HtmlText.extract(u8,
      UTF8String.fromString("text/html; charset=utf-8")).toString
      === "café €5")
    // header charset (when present) outranks a contradicting meta
    assert(HtmlText.extract(body.getBytes("ISO-8859-1"),
      UTF8String.fromString("text/html; charset=iso-8859-1")).toString
      === "café")
    // meta claiming utf-16 on ASCII-superset bytes → utf-8 (HTML5 rule)
    val lie = "<meta charset=\"utf-16le\"><p>café</p>"
    assert(sniffed(lie.getBytes("UTF-8")) === "café")
    // a meta OUTSIDE the 1024-byte prescan window is not consulted
    val far = "<html><head>" + ("<!-- pad -->" * 120) +
      "<meta charset=\"iso-8859-1\"></head><body>café</body></html>"
    assert(sniffed(far.getBytes("UTF-8")) === "café",
      "beyond the window the utf-8 fallback applies (and the bytes ARE utf-8)")
    // unknown meta name keeps scanning; none left → utf-8
    assert(sniffed("<meta charset=\"klingon\"><p>ok</p>".getBytes("UTF-8"))
      === "ok")
    // a '>' INSIDE a quoted attribute value must not truncate the tag:
    // the prescan's attribute algorithm consumes quoted values across
    // '>', so the charset after the quoted content still counts...
    val gtInQuote = "<html><head><meta name=\"desc\" content=\"a > b\" " +
      "charset=\"iso-8859-1\"></head><body>café</body></html>"
    assert(sniffed(gtInQuote.getBytes("ISO-8859-1")) === "café",
      "quoted '>' truncated the meta tag before its charset")
    // ...and the outer scan must resume AFTER the real tag end, not
    // mid-tag where quoted-value TEXT (here a meta-shaped string
    // inside a description) would be re-parsed as a fresh declaration
    val resumeMidTag = "<html><head><meta name=\"desc\" " +
      "content=\"a > <meta charset=iso-8859-1>\"></head>" +
      "<body>café</body></html>"
    assert(sniffed(resumeMidTag.getBytes("UTF-8")) === "café",
      "resuming mid-tag surfaced a charset from inside a quoted value")
  }

  test("malformed markup goldens: document-order, drop-to-end, literal entities") {
    // unterminated constructs drop to end — raw script must not leak
    assert(extract("a <script>var x = 1; b") === "a")
    assert(extract("a <style>p{} b") === "a")
    // custom elements whose NAME merely starts with script/style are
    // ordinary tags — their text content survives (HTML5 name
    // boundary: whitespace, '/' or '>')
    assert(extract("<styleguide>visible text</styleguide>rest") ===
      "visible text rest")
    assert(extract("<scripted-widget>hello</scripted-widget> w") === "hello w")
    // ...and an end tag whose name merely STARTS with script is inert
    // script content, not a close
    assert(extract("a <script>x = \"</scriptx>\";</script> b") === "a b")
    // attributes after the name still mark a real script element
    assert(extract("a <script type=\"module\">x()</script> b") === "a b")
    assert(extract("a <!-- never closed b") === "a")
    assert(extract("a <unclosed tag b") === "a")
    // document order beats construct priority: a comment opener inside
    // a script body is script CONTENT; a script opener inside a
    // comment is comment content
    assert(extract("<script>x = \"<!--\";</script> vis <!-- c -->") === "vis")
    assert(extract("<!-- <script> --> vis") === "vis")
    // script end tag with attributes-ish tail and case mix
    assert(extract("<SCRIPT>j()</SCRIPT \t > vis") === "vis")
    // entities: double-encoded stays single-decoded; unknown, bare
    // and unterminated stay literal; nbsp decodes to U+00A0 (which
    // does NOT collapse — it is not in RE2 \\s)
    assert(extract("&amp;lt;") === "&lt;")
    assert(extract("&bogus; &toolongtodecode; & x &#xD800; &#99999999;") ===
      "&bogus; &toolongtodecode; & x &#xD800; &#99999999;")
    assert(extract("a&nbsp;b") === "a b")
    assert(extract("&#65;&#x42;") === "AB")
    // whitespace collapse is exactly [\t\n\f\r ]; vertical tab stays
    assert(extract("  a \t\n\f\r  b  ") === "a b")
    assert(extract("a  b") === "a  b")
    // tags fuse to a single space, never zero
    assert(extract("a<br/>b") === "a b")
    assert(extract("<p></p>") === "")
    // a '>' inside a quoted attribute VALUE does not end the tag (the
    // tokenizer's attribute-value state) — no attribute text leaks
    assert(extract("a <span title=\"x > y\">b</span> c") === "a b c")
    // but a stray quote after a bare '<' in free text is NOT a value
    // delimiter (no '='), so the first '>' still closes the "tag" —
    // the pre-r18 behavior for non-markup text is preserved
    assert(extract("1 < 2 && \"q\" > 3 ok") === "1 3 ok")
    assert(extract("") === "")
  }

  test("q95 wrapper inverse: wrapped text extracts to its collapsed self") {
    val samples = Seq(
      "plain words only",
      "multi  space\tand\nnewline text",
      "chars & < > \" ' ! ? mixed in",
      "no-space-single-token",
      "", "   ", "a")
    samples.foreach { text =>
      def esc(t: String): String = t
        .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace("!", "&#33;").replace("?", "&#x3F;")
        .replace("\"", "&quot;").replace("'", "&apos;")
      val mid = text.indexOf(' ', text.length / 2)
      val body = if (mid < 0) s"<p>${esc(text)}</p>"
        else s"<p>${esc(text.substring(0, mid))}</p>\n<BR/>\n" +
          s"<p>${esc(text.substring(mid + 1))}</p>"
      val html = "<!DOCTYPE html><html><head><title></title>" +
        "<style>b{}</style><SCRIPT>s()</SCRIPT></head><body>" +
        s"<!-- n -->$body</body></html>"
      val expected = text.replaceAll("[\\t\\n\\f\\r ]+", " ")
        .replaceAll("^ | $", "")
      assert(extract(html) === expected, s"text='$text'")
    }
  }

  test("html_text is callable from SQL via registration") {
    org.apache.spark.sql.graftfns.VectorFunctions.register(spark)
    val out = spark.sql(
      "SELECT html_text(cast('<p>a &amp; b</p>' AS BINARY), 'text/html') AS t")
      .collect().head.getString(0)
    assert(out === "a & b")
  }
}
