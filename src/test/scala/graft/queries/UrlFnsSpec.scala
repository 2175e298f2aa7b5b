package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfns.{UrlFns, UrlKernel}
import org.apache.spark.unsafe.types.UTF8String

/** url_canon / url_host / url_domain / url_surt — the contract's
  * rules pinned one by one, plus SQL registration and null shapes.
  */
class UrlFnsSpec extends SparkTestBase {

  private def canon(s: String): String =
    UrlKernel.canon(UTF8String.fromString(s)).toString
  private def host(s: String): String =
    Option(UrlKernel.host(UTF8String.fromString(s))).map(_.toString).orNull
  private def domain(s: String): String =
    Option(UrlKernel.domain(UTF8String.fromString(s))).map(_.toString).orNull
  private def surt(s: String): String =
    Option(UrlKernel.surt(UTF8String.fromString(s))).map(_.toString).orNull

  test("canonicalization rules, one by one") {
    // identity on an already-canonical url
    assert(canon("https://ex.com/a/b?x=1") === "https://ex.com/a/b?x=1")
    // scheme + host lowercase; default port dropped; empty path → "/"
    assert(canon("HTTPS://Ex.COM:443") === "https://ex.com/")
    assert(canon("http://ex.com:80/a") === "http://ex.com/a")
    // non-default port kept
    assert(canon("http://ex.com:8080/a") === "http://ex.com:8080/a")
    // fragment stripped, userinfo stripped, FQDN trailing dot stripped
    assert(canon("https://u:p@ex.com./a#frag") === "https://ex.com/a")
    // whitespace trimmed
    assert(canon("  https://ex.com/a  ") === "https://ex.com/a")
    // dot segments + consecutive slashes
    assert(canon("https://ex.com/a/./b/../c") === "https://ex.com/a/c")
    assert(canon("https://ex.com//a///b/") === "https://ex.com/a/b/")
    assert(canon("https://ex.com/..") === "https://ex.com/")
    // query: empties dropped, tracking dropped, rest sorted; emptied
    // query loses its '?'
    assert(canon("https://ex.com/a?b=2&a=1") === "https://ex.com/a?a=1&b=2")
    assert(canon("https://ex.com/a?utm_source=x&b=2&fbclid=1&gclid=2")
      === "https://ex.com/a?b=2")
    assert(canon("https://ex.com/a?utm_campaign=x") === "https://ex.com/a")
    assert(canon("https://ex.com/a?") === "https://ex.com/a")
    // case in path/query is PRESERVED (only scheme + host fold)
    assert(canon("https://ex.com/A/B?Q=V") === "https://ex.com/A/B?Q=V")
    // opaque forms pass through (fragment still stripped), no host
    assert(canon("mailto:a@ex.com") === "mailto:a@ex.com")
    assert(canon("data:text/plain,x#f") === "data:text/plain,x")
    // an unparseable "port" stays part of the authority, not dropped
    assert(canon("https://ex.com:notaport/a") === "https://ex.com:notaport/a")
    // ipv6 literal: bracket colons are not a port; default port drops
    assert(canon("https://[2001:DB8::1]:443/a") === "https://[2001:db8::1]/a")
    assert(canon("https://[2001:db8::1]:8443/a") === "https://[2001:db8::1]:8443/a")
  }

  test("host and registered domain") {
    assert(host("https://WWW.Ex.COM:8080/a") === "www.ex.com")
    assert(host("mailto:a@ex.com") === null)
    assert(domain("https://a.b.ex.com/x") === "ex.com")
    assert(domain("https://ex.com/x") === "ex.com")
    // embedded multi-part suffix subset: co.uk takes three labels
    assert(domain("https://shop.example.co.uk/x") === "example.co.uk")
    assert(domain("https://example.co.uk/x") === "example.co.uk")
    // a bare suffix host returns itself (nothing registered below it)
    assert(domain("https://co.uk/") === "co.uk")
    // IP hosts return themselves
    assert(domain("http://192.168.0.1/x") === "192.168.0.1")
    assert(domain("http://[2001:db8::1]/x") === "[2001:db8::1]")
    // single-label host (intranet) returns itself
    assert(domain("http://localhost:9200/x") === "localhost")
  }

  test("surt: reversed labels, www-fold, port, canonical tail") {
    assert(surt("https://www.Example.COM/a/b?b=2&a=1")
      === "com,example)/a/b?a=1&b=2")
    // www-fold collates the bare and www variants together
    assert(surt("https://example.com/a/b?a=1&b=2")
      === "com,example)/a/b?a=1&b=2")
    assert(surt("http://sub.example.co.uk:8080/x")
      === "uk,co,example,sub:8080)/x")
    // IP hosts are not reversed
    assert(surt("http://192.168.0.1/x") === "192.168.0.1)/x")
    assert(surt("mailto:a@ex.com") === null)
  }

  test("SQL registration and column API null shapes") {
    val df = spark.createDataFrame(Seq(
      (1L, "https://WWW.Ex.COM:443/a/../b?utm_source=t&z=1&a=2"),
      (2L, "mailto:x@ex.com"),
      (3L, null.asInstanceOf[String]))).toDF("id", "url")
    val out = df.select(col("id"), UrlFns.urlCanon(col("url")).as("c"),
      UrlFns.urlHost(col("url")).as("h"),
      UrlFns.urlDomain(col("url")).as("d"),
      UrlFns.urlSurt(col("url")).as("s"))
      .orderBy(col("id")).collect()
    assert(out(0).getString(1) === "https://www.ex.com/b?a=2&z=1")
    assert(out(0).getString(2) === "www.ex.com")
    assert(out(0).getString(3) === "ex.com")
    assert(out(0).getString(4) === "com,ex)/b?a=2&z=1")
    assert(out(1).getString(1) === "mailto:x@ex.com")
    assert(out(1).isNullAt(2) && out(1).isNullAt(3) && out(1).isNullAt(4))
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
    df.createOrReplaceTempView("urls_fixture")
    val viaSql = spark.sql(
      "SELECT url_domain(url) d, url_surt(url) s FROM urls_fixture WHERE id = 1")
      .collect()(0)
    assert(viaSql.getString(0) === "ex.com")
    assert(viaSql.getString(1) === "com,ex)/b?a=2&z=1")
  }
}
