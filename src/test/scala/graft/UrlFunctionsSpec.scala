package graft

import graft.functions.UrlFunctions._
import org.apache.spark.sql.functions._

/** Edge cases of the URL canonicalization + registered-domain layer. */
class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(normalizeUrl($"u")).as[String].collect().toSeq

  private def dom(hosts: String*): Seq[String] =
    hosts.toDF("h").select(registeredDomain($"h")).as[String].collect().toSeq

  test("case, www, default port, fragment, trailing slash all collapse") {
    val variants = Seq(
      "https://www.Example.COM/a/b/?x=1#frag",
      "HTTPS://EXAMPLE.com:443/a/b?x=1",
      " https://example.com/a/b/?x=1 ")
    assert(norm(variants: _*).toSet === Set("https://example.com/a/b?x=1"))
  }

  test("non-default port and http default port") {
    assert(norm("https://h.com:8443/p") === Seq("https://h.com:8443/p"))
    assert(norm("http://h.com:80/p") === Seq("http://h.com/p"))
    assert(norm("http://h.com:443/p") === Seq("http://h.com:443/p"))
  }

  test("root path normalizes to /") {
    assert(norm("https://h.com", "https://h.com/", "https://h.com///")
      .toSet === Set("https://h.com/"))
  }

  test("params: tracking removed, rest sorted, empty query dropped") {
    assert(norm("https://h.com/p?b=2&utm_source=x&a=1&gclid=g&fbclid=f")
      === Seq("https://h.com/p?a=1&b=2"))
    assert(norm("https://h.com/p?utm_campaign=c&ref=r")
      === Seq("https://h.com/p"))
    // utm_ matches by key prefix; a VALUE containing utm_ survives
    assert(norm("https://h.com/p?q=utm_test") === Seq("https://h.com/p?q=utm_test"))
  }

  test("path case is preserved (URL paths are case-sensitive)") {
    assert(norm("https://H.com/CaseSensitive") === Seq("https://h.com/CaseSensitive"))
  }

  test("registered domain: two-level suffixes, subdomains, bare hosts") {
    assert(dom("a.b.example.co.uk") === Seq("example.co.uk"))
    assert(dom("deep.sub.example.com") === Seq("example.com"))
    assert(dom("example.org") === Seq("example.org"))
    assert(dom("localhost") === Seq("localhost"))
    // exactly a public suffix: no registrable label above it → 2-label tier
    assert(dom("co.uk") === Seq("co.uk"))
  }

  test("urlHost strips scheme, www, port, path, query, fragment") {
    val hosts = Seq("HTTPS://WWW.Ex.COM:443/p?q=1#f", "http://ex.com")
      .toDF("u").select(urlHost($"u")).as[String].collect().toSeq
    assert(hosts === Seq("ex.com", "ex.com"))
  }
}
