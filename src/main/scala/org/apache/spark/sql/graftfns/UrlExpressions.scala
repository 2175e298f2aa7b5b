package org.apache.spark.sql.graftfns

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL-centric crawl operators — `url_canon` / `url_host` /
  * `url_domain` / `url_surt`, the normalization layer every
  * production crawl pipeline applies BEFORE text-level dedup: pages
  * are filtered, mixed and rate-balanced by registered domain, and a
  * crawl index (CDX) is keyed by a canonical sort-friendly URL form.
  * Native codegen expressions, not UDFs — these run once per crawled
  * record over the full corpus (the [[HtmlText]] justification;
  * reference trace rosbag2parquet README.md:2's query-enablement
  * thesis extended to the crawl axis).
  *
  * Deterministic canonicalization contract (the q104 oracle replays
  * it slot-by-slot in SQL):
  *
  *  1. trim ASCII whitespace; strip the fragment (first '#' to end).
  *  2. no "://" → OPAQUE: `url_canon` returns the trimmed,
  *     fragment-stripped input unchanged; host/domain/surt are NULL
  *     (mailto:, data:, javascript: — never silently mangled).
  *  3. scheme and host lowercase; userinfo (up to '@' in the
  *     authority) stripped; a trailing '.' on the host (FQDN form)
  *     stripped; the port dropped when it is the scheme's default
  *     (http/ws 80, https/wss 443, ftp 21), kept otherwise.
  *  4. empty path → "/"; dot-segments removed (RFC 3986
  *     remove_dot_segments: "/a/./b/../c" → "/a/c") and consecutive
  *     slashes collapsed ("//" → "/", the wayback rule).
  *  5. query parameters: empty params dropped, tracking params
  *     dropped (name starting "utm_", or fbclid/gclid/msclkid — the
  *     session-noise the wayback canonicalizer strips), the rest
  *     SORTED lexicographically; an emptied query drops its '?'.
  *     Percent-encoding is NOT normalized (a decode/re-encode pass
  *     is charset-sensitive and lossy on real-web bytes; two
  *     spellings of one codepoint stay distinct, stated plainly).
  *
  * `url_host`: the canonical host alone (no port). `url_domain`: the
  * REGISTERED domain under a public-suffix-list SUBSET (the
  * multi-part country suffixes in [[UrlKernel.MultiPartSuffixes]];
  * everything else takes the last two labels) — the full Mozilla PSL
  * is a moving external artifact, so the subset is embedded,
  * versioned with the code, and documented as such; IP hosts return
  * themselves. `url_surt`: the Sort-friendly URI Reordering
  * Transform used by CDX indexes — reversed host labels
  * comma-joined + [":port"] + ")" + canonical path/query, a leading
  * `www.` label dropped (the wayback convention, so `www.` and bare
  * variants of one site collate together); IP hosts are not
  * reversed.
  */
object UrlKernel {

  /** Multi-part public suffixes recognized by `url_domain` — a
    * deliberate PSL subset (see the module doc): the high-traffic
    * two-label country suffixes. Everything absent falls back to the
    * last-two-labels rule.
    */
  val MultiPartSuffixes: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    Seq(
      "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk",
      "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
      "com.au", "net.au", "org.au", "edu.au", "gov.au",
      "co.nz", "net.nz", "org.nz",
      "com.br", "net.br", "org.br",
      "com.mx", "com.ar", "com.co", "com.pe", "com.ve",
      "com.cn", "net.cn", "org.cn", "com.tw", "com.hk",
      "co.in", "net.in", "org.in",
      "co.za", "com.sg", "com.my", "co.kr", "co.th", "co.id",
      "com.tr", "com.eg", "com.sa", "com.vn", "com.ph", "com.pk",
      "com.ng", "com.ua").foreach(s.add)
    s
  }

  private final case class Parsed(scheme: String, host: String,
      port: Int, path: String, query: String)

  /** null = opaque (no "://" authority form). */
  private def parse(url: String): Parsed = {
    val hashAt = url.indexOf('#')
    val noFrag = if (hashAt < 0) url else url.substring(0, hashAt)
    val sep = noFrag.indexOf("://")
    if (sep <= 0) return null
    val scheme = noFrag.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    if (!scheme.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        c == '+' || c == '-' || c == '.')) return null
    var i = sep + 3
    var authEnd = i
    while (authEnd < noFrag.length && noFrag.charAt(authEnd) != '/' &&
      noFrag.charAt(authEnd) != '?') authEnd += 1
    var auth = noFrag.substring(i, authEnd)
    val at = auth.indexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    // IPv6 literal [..][:port] — the ':' inside brackets is not a port
    var host: String = null
    var port = -1
    if (auth.startsWith("[")) {
      val close = auth.indexOf(']')
      if (close < 0) { host = auth } else {
        host = auth.substring(0, close + 1)
        if (close + 2 < auth.length && auth.charAt(close + 1) == ':')
          port = portOf(auth.substring(close + 2))
      }
    } else {
      val colon = auth.lastIndexOf(':')
      val p = if (colon >= 0) portOf(auth.substring(colon + 1)) else -1
      if (colon >= 0 && p >= 0) { host = auth.substring(0, colon); port = p }
      else host = auth // unparseable "port" stays part of the authority
    }
    host = host.toLowerCase(java.util.Locale.ROOT)
    if (host.length > 1 && host.endsWith(".") && !host.startsWith("["))
      host = host.substring(0, host.length - 1)
    val rest = noFrag.substring(authEnd)
    val qAt = rest.indexOf('?')
    val path = if (qAt < 0) rest else rest.substring(0, qAt)
    val query = if (qAt < 0) null else rest.substring(qAt + 1)
    Parsed(scheme, host, port, path, query)
  }

  private def portOf(s: String): Int =
    if (s.nonEmpty && s.forall(c => c >= '0' && c <= '9') && s.length <= 5)
      try s.toInt catch { case _: NumberFormatException => -1 }
    else -1

  private def defaultPort(scheme: String): Int = scheme match {
    case "http" | "ws" => 80
    case "https" | "wss" => 443
    case "ftp" => 21
    case _ => -1
  }

  /** RFC 3986 5.2.4 remove_dot_segments, plus consecutive-slash
    * collapse ("//" → "/", the wayback canonicalizer's rule) — both
    * gated on the same prescan so dot-less and dotted paths take one
    * consistent code path.
    */
  private[graftfns] def removeDotSegments(path: String): String = {
    if (path.indexOf("/.") < 0 && path.indexOf("//") < 0) return path
    val out = new java.util.ArrayDeque[String]()
    var i = 0
    val n = path.length
    var endsWithSlash = false
    while (i < n) {
      var j = path.indexOf('/', i + 1)
      if (j < 0) j = n
      val seg = path.substring(i, j) // includes the leading '/'
      seg match {
        case "/." | "/" => endsWithSlash = true
        case "/.." =>
          if (!out.isEmpty) out.removeLast()
          endsWithSlash = true
        case _ =>
          out.addLast(seg)
          endsWithSlash = false
      }
      i = j
    }
    val sb = new java.lang.StringBuilder(path.length)
    val it = out.iterator()
    while (it.hasNext) sb.append(it.next())
    if (endsWithSlash || sb.length == 0) sb.append('/')
    sb.toString
  }

  private val DroppedParams = java.util.Set.of("fbclid", "gclid", "msclkid")

  /** Canonical query string (already '?'-stripped), or null when the
    * cleaned parameter list is empty.
    */
  private def canonQuery(query: String): String = {
    if (query == null || query.isEmpty) return null
    val kept = query.split("&", -1).toSeq.filter { p =>
      if (p.isEmpty) false
      else {
        val eq = p.indexOf('=')
        val name = (if (eq < 0) p else p.substring(0, eq))
          .toLowerCase(java.util.Locale.ROOT)
        !(name.startsWith("utm_") || DroppedParams.contains(name))
      }
    }.sorted
    if (kept.isEmpty) null else kept.mkString("&")
  }

  /** Row kernels — shared verbatim by eval and codegen. An opaque
    * input still has its fragment stripped (contract step 1 applies
    * before the authority test).
    */
  def canon(u: UTF8String): UTF8String = {
    val raw = trimString(u)
    val p = parse(raw)
    if (p == null) {
      val hashAt = raw.indexOf('#')
      return UTF8String.fromString(
        if (hashAt < 0) raw else raw.substring(0, hashAt))
    }
    val sb = new java.lang.StringBuilder(raw.length)
    sb.append(p.scheme).append("://").append(p.host)
    if (p.port >= 0 && p.port != defaultPort(p.scheme))
      sb.append(':').append(p.port)
    sb.append(removeDotSegments(if (p.path.isEmpty) "/" else p.path))
    val q = canonQuery(p.query)
    if (q != null) sb.append('?').append(q)
    UTF8String.fromString(sb.toString)
  }

  def host(u: UTF8String): UTF8String = {
    val p = parse(trimString(u))
    if (p == null || p.host.isEmpty) null
    else UTF8String.fromString(p.host)
  }

  def domain(u: UTF8String): UTF8String = {
    val p = parse(trimString(u))
    if (p == null || p.host.isEmpty) return null
    UTF8String.fromString(domainOf(p.host))
  }

  private[graftfns] def domainOf(host: String): String = {
    if (isIpHost(host)) return host
    val labels = host.split("\\.", -1)
    if (labels.length <= 2) return host
    val lastTwo = labels(labels.length - 2) + "." + labels(labels.length - 1)
    val take = if (MultiPartSuffixes.contains(lastTwo)) 3 else 2
    if (labels.length <= take) host
    else labels.takeRight(take).mkString(".")
  }

  private[graftfns] def isIpHost(host: String): Boolean =
    host.startsWith("[") ||
      host.nonEmpty && host.forall(c => (c >= '0' && c <= '9') || c == '.')

  def surt(u: UTF8String): UTF8String = {
    val raw = trimString(u)
    val p = parse(raw)
    if (p == null || p.host.isEmpty) return null
    val h = if (p.host.startsWith("www.") && p.host.length > 4)
      p.host.substring(4) else p.host
    val sb = new java.lang.StringBuilder(raw.length)
    if (isIpHost(h)) sb.append(h)
    else {
      val labels = h.split("\\.", -1)
      var i = labels.length - 1
      while (i >= 0) {
        sb.append(labels(i))
        if (i > 0) sb.append(',')
        i -= 1
      }
    }
    if (p.port >= 0 && p.port != defaultPort(p.scheme))
      sb.append(':').append(p.port)
    sb.append(')')
    sb.append(removeDotSegments(if (p.path.isEmpty) "/" else p.path))
    val q = canonQuery(p.query)
    if (q != null) sb.append('?').append(q)
    UTF8String.fromString(sb.toString)
  }

  private def trimString(u: UTF8String): String = {
    val s = u.toString
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) <= ' ') a += 1
    while (b > a && s.charAt(b - 1) <= ' ') b -= 1
    s.substring(a, b)
  }
}

private[graftfns] abstract class UrlExpr extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  protected def kernel: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UrlKernel.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.$kernel($c);
      ${ev.isNull} = (${ev.value} == null);""")
  }
}

/** Canonical URL — see [[UrlKernel]]'s contract. */
case class UrlCanon(child: Expression) extends UrlExpr {
  override def prettyName: String = "url_canon"
  override protected def kernel: String = "canon"
  override protected def nullSafeEval(input: Any): Any =
    UrlKernel.canon(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Canonical host (no port); NULL for opaque/host-less URLs. */
case class UrlHost(child: Expression) extends UrlExpr {
  override def prettyName: String = "url_host"
  override protected def kernel: String = "host"
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    UrlKernel.host(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registered domain under the embedded PSL subset; IP hosts return
  * themselves; NULL for opaque URLs.
  */
case class UrlDomain(child: Expression) extends UrlExpr {
  override def prettyName: String = "url_domain"
  override protected def kernel: String = "domain"
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    UrlKernel.domain(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SURT form (the CDX index key); NULL for opaque URLs. */
case class UrlSurt(child: Expression) extends UrlExpr {
  override def prettyName: String = "url_surt"
  override protected def kernel: String = "surt"
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    UrlKernel.surt(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column API. */
object UrlFns {
  def urlCanon(u: Column): Column =
    ExpressionUtils.column(UrlCanon(ExpressionUtils.expression(u)))
  def urlHost(u: Column): Column =
    ExpressionUtils.column(UrlHost(ExpressionUtils.expression(u)))
  def urlDomain(u: Column): Column =
    ExpressionUtils.column(UrlDomain(ExpressionUtils.expression(u)))
  def urlSurt(u: Column): Column =
    ExpressionUtils.column(UrlSurt(ExpressionUtils.expression(u)))
}
