package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Byte-level contracts for URL canonicalization: RFC 3986 §6
  * known-equivalence pairs, the tracking-strip/query-sort rules,
  * idempotence, the corrupt taxonomy, and registered-domain suffix
  * arithmetic. */
class UrlCanonSpec extends graft.SparkSpec {

  private def c(s: String): String = {
    val r = UrlCanon.canon(UTF8String.fromString(s))
    if (r == null) null else r.toString
  }
  private def rd(s: String): String = {
    val r = UrlCanon.registeredDomain(UTF8String.fromString(s))
    if (r == null) null else r.toString
  }

  test("scheme/host case, default ports, empty path") {
    assert(c("HTTP://WWW.Example.COM") == "http://www.example.com/")
    assert(c("http://example.com:80/a") == "http://example.com/a")
    assert(c("https://example.com:443/") == "https://example.com/")
    assert(c("https://example.com:0443/") == "https://example.com/")
    assert(c("http://example.com:8080/a") == "http://example.com:8080/a")
    assert(c("http://example.com:008080/") == "http://example.com:8080/")
    assert(c("ws://h:80/x") == "ws://h/x")
    assert(c("http://example.com:") == "http://example.com/")
  }

  test("percent-encoding: unreserved decodes, reserved keeps uppercase hex") {
    assert(c("http://h/%7Euser") == "http://h/~user")
    assert(c("http://h/a%2Fb") == "http://h/a%2Fb") // '/' stays encoded
    assert(c("http://h/a%2fb") == "http://h/a%2Fb") // hex uppercased
    assert(c("http://h/%41%62%2D%5F") == "http://h/Ab-_")
    assert(c("http://h/p?k%65y=v%61l") == "http://h/p?key=val")
  }

  test("dot segments, duplicate slashes preserved, trailing slash semantics") {
    assert(c("http://h/a/./b/../c") == "http://h/a/c")
    assert(c("http://h/a/b/..") == "http://h/a/")
    assert(c("http://h/a/.") == "http://h/a/")
    assert(c("http://h/../a") == "http://h/a")
    assert(c("http://h/a//b") == "http://h/a//b")
    assert(c("http://h//") == "http://h//")
  }

  test("query: tracking strip, byte-order sort, bare keys, fragment drop") {
    assert(c("http://h/p?b=2&a=1") == "http://h/p?a=1&b=2")
    assert(c("http://h/p?utm_source=x&a=1&utm_campaign=y") ==
      "http://h/p?a=1")
    assert(c("http://h/p?gclid=abc&fbclid=def") == "http://h/p")
    assert(c("http://h/p?a=1#frag") == "http://h/p?a=1")
    assert(c("http://h/p#frag") == "http://h/p")
    assert(c("http://h/p?flag&a=1") == "http://h/p?a=1&flag")
    assert(c("http://h/p?a=&a") == "http://h/p?a&a=") // bare before '='
    assert(c("http://h/p?a=2&a=1") == "http://h/p?a=1&a=2") // dup kept
    assert(c("http://h/p?ref=nav") == "http://h/p?ref=nav") // ref kept
    assert(c("http://h/p?&&a=1") == "http://h/p?a=1") // empty params
  }

  test("userinfo kept verbatim, IPv6 hosts, port on bracket literal") {
    assert(c("http://User:Pw@Example.COM/x") ==
      "http://User:Pw@example.com/x")
    assert(c("http://[2001:DB8::1]/x") == "http://[2001:db8::1]/x")
    assert(c("http://[2001:db8::1]:80/x") == "http://[2001:db8::1]/x")
    assert(c("http://[2001:db8::1]:8443/x") ==
      "http://[2001:db8::1]:8443/x")
  }

  test("corrupt taxonomy in-band: null, never thrown") {
    assert(c("not a url") == null)
    assert(c("://missing-scheme.com") == null)
    assert(c("1http://bad-scheme-start.com") == null)
    assert(c("ht tp://space.com") == null)
    assert(c("http://") == null) // empty host
    assert(c("http://h:not-a-port/") == null)
    assert(c("http://h/torn%2") == null)
    assert(c("http://h/bad%zz") == null)
    assert(c("http://h/p?torn=%g1") == null)
  }

  test("idempotence: canon(canon(u)) == canon(u) across the recipe space") {
    val messy = Seq(
      "HTTP://WWW.Example.COM:80/a/./b/../c%7E?utm_source=t&b=2&a=1#f",
      "https://A.B.example.CO.UK:443//x/%41?z&y=%2F",
      "http://user@h:0080/p/..",
      "ws://H/%7e%7E?k=v&k=a",
      "https://[2001:DB8::1]:8443/seg/./x?q=%5A")
    for (u <- messy) {
      val once = c(u)
      assert(once != null, u)
      assert(c(once) == once, s"not idempotent on $u -> $once")
    }
  }

  test("registered domain: suffix table, bare hosts, URLs, IPs, violations") {
    assert(rd("a.blog.example.co.uk") == "example.co.uk")
    assert(rd("example.co.uk") == "example.co.uk")
    assert(rd("co.uk") == null) // the suffix itself has no registrant
    assert(rd("deep.sub.example.com") == "example.com")
    assert(rd("example.com") == "example.com")
    assert(rd("localhost") == "localhost")
    assert(rd("EXAMPLE.COM.") == "example.com") // trailing dot + case
    assert(rd("192.168.0.1") == "192.168.0.1")
    assert(rd("[2001:db8::1]") == "[2001:db8::1]")
    assert(rd("HTTPS://Sub.Example.COM.AU:443/p?x=1") == "example.com.au")
    assert(rd("http://h:bad-port/") == null) // URL path inherits canon
    assert(rd("a..b.com") == null) // empty label
    assert(rd("") == null)
    // bare host with :port — port split off, never leaks into labels
    assert(rd("example.com:8080") == "example.com")
    // UNBRACKETED IPv6 is not a host:port — it passes through whole,
    // never truncates at the first colon into a fake numeric domain
    assert(rd("2001:db8::1") == "2001:db8::1")
    assert(rd("::1") == "::1")
    assert(rd("sub.example.co.uk:443") == "example.co.uk")
    assert(rd("[2001:db8::1]:8080") == "[2001:db8::1]")
    assert(rd("192.168.0.1:53") == "192.168.0.1")
    // at most ONE trailing dot is stripped: a double dot is an empty
    // label on both the bare and the URL branch
    assert(rd("example.com..") == null)
  }

  test("column API + SQL registration round-trip") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq("HTTP://A.Example.CO.UK:80/x/./y?utm_source=t&b=2&a=1")
      .toDF("url")
    val row = df.select(
      UrlCanon.canonicalUrl($"url").as("cu"),
      UrlCanon.registeredDomainCol($"url").as("rdom")).head()
    assert(row.getString(0) == "http://a.example.co.uk/x/y?a=1&b=2")
    assert(row.getString(1) == "example.co.uk")
    val sqlRow = df.createOrReplaceTempView("u_tmp")
    val r2 = spark.sql(
      "SELECT canonical_url(url), registered_domain(url) FROM u_tmp")
      .head()
    assert(r2.getString(0) == "http://a.example.co.uk/x/y?a=1&b=2")
    assert(r2.getString(1) == "example.co.uk")
  }
}
