package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization for SOURCE KEYS (tx53): the key side of web
  * ingest that `sourceCap`, heavy hitters (tx43), and per-source
  * quotas (tx40) group on. Real crawl URLs carry the same resource
  * under byte-different spellings — case-shifted scheme/host, default
  * ports, unsorted queries, tracking params, percent-encoded
  * unreserved characters, dot-segments, fragments — so grouping on
  * the raw string both splits one source into many keys and (with
  * tracking params) explodes cardinality unboundedly. This expression
  * makes the canonical key explicit, exactly [[UnicodeNormKeyExpr]]'s
  * role on the text axis.
  *
  * Normalization applied (RFC 3986 §6 syntax-based normalization plus
  * the standard tracking-strip practice; every step is deterministic
  * byte arithmetic, no locale, no network):
  *   - scheme and host lower-cased (§6.2.2.1)
  *   - percent-decoding of UNRESERVED octets only (ALPHA / DIGIT /
  *     `-._~`, §6.2.2.2); retained escapes' hex upper-cased; a torn or
  *     non-hex escape is a structural violation → null in-band
  *   - default port dropped (http:80, https:443, ftp:21, ws:80,
  *     wss:443), empty `:` dropped, non-numeric port → null
  *   - path dot-segments removed (§5.2.4's stack algorithm), empty
  *     path → "/"
  *   - query: params split on `&`, empties dropped, tracking params
  *     removed ([[UrlCanon.trackingParam]] — utm_* plus the documented
  *     click-id set), remainder SORTED by (key, value) byte order
  *     (duplicates kept, order-stable), `?` dropped when none remain
  *   - fragment dropped
  *
  * NOT applied, deliberately: duplicate-slash collapse and trailing
  * slash addition (path semantics differ per server), `+`→space in
  * queries (form-encoding ambiguity), IDN/punycode mapping (needs the
  * IDNA tables; a production deployment slots it between host
  * lower-case and suffix lookup).
  *
  * Corrupt taxonomy IN-BAND (null, never thrown): no `://`, empty or
  * alien scheme, empty host, non-numeric port, torn percent escape.
  */
case class CanonicalUrlExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"canonical_url expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    UrlCanon.canon(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlCanon.canon($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(c: Expression): CanonicalUrlExpr =
    copy(child = c)

  override def prettyName: String = "canonical_url"
}

/** Registered-domain extraction (tx53's second half): the GROUPING
  * grain of per-source policy — quota caps and contamination ledgers
  * key on "the site", not the full host (`a.blog.example.co.uk` and
  * `b.blog.example.co.uk` are one publisher). Input is a URL or a
  * bare host; output is the public-suffix-plus-one label, the host
  * itself for IP literals, null on structural violations. The
  * multi-label suffix table is static data riding the expression
  * ([[UrlCanon.twoLabelSuffixes]] — the sq8 codebook pattern): it
  * enumerates the major ccTLD second-level registries; a production
  * deployment regenerates it from the public-suffix list behind the
  * same expression, exactly the [[UnicodeNorm]] confusables seam.
  */
case class RegisteredDomainExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"registered_domain expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    UrlCanon.registeredDomain(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlCanon.registeredDomain($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(c: Expression): RegisteredDomainExpr =
    copy(child = c)

  override def prettyName: String = "registered_domain"
}

object UrlCanon {

  /** Schemes whose default port drops. */
  private val defaultPorts = Map("http" -> "80", "https" -> "443",
    "ftp" -> "21", "ws" -> "80", "wss" -> "443")

  /** Tracking params stripped from the canonical query: any `utm_*`
    * plus the cross-vendor click/session ids. `ref` is NOT here — it
    * is semantic on enough sites that stripping it merges distinct
    * resources. */
  private[functions] def trackingParam(k: String): Boolean =
    k.startsWith("utm_") || (k match {
      case "gclid" | "fbclid" | "msclkid" | "dclid" | "yclid" |
           "igshid" | "mc_cid" | "mc_eid" | "_ga" | "wbraid" |
           "gbraid" => true
      case _ => false
    })

  /** Second-level public suffixes: registered domain = one label more
    * than these. Static excerpt of the major ccTLD registries (the
    * public-suffix list is DATA, regenerated at deployment — see
    * [[RegisteredDomainExpr]]). */
  private[functions] val twoLabelSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.kr", "or.kr", "ac.kr", "go.kr",
    "com.br", "org.br", "net.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.mx", "org.mx", "gob.mx",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "com.ar", "com.tr", "com.tw", "com.sg", "com.hk", "com.my",
    "co.za", "org.za", "gov.za",
    "co.id", "or.id", "ac.id",
    "com.eg", "com.sa", "com.ua", "co.il", "org.il", "co.th",
    "com.vn", "com.ph", "com.pk", "com.ng", "co.ke")

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else -1

  private def isUnreserved(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '.' || b == '_' ||
      b == '~'

  /** Percent-normalize one component: decode unreserved escapes,
    * upper-case the hex of retained ones. Null (as None) on a torn or
    * non-hex escape — a structural violation, not a best-effort key. */
  private def pctNormalize(s: String): Option[String] = {
    if (s.indexOf('%') < 0) return Some(s)
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 >= s.length) return None // torn escape
        val h = hexVal(s.charAt(i + 1)); val l = hexVal(s.charAt(i + 2))
        if (h < 0 || l < 0) return None
        val b = (h << 4) | l
        if (isUnreserved(b)) sb.append(b.toChar)
        else {
          sb.append('%')
          sb.append(java.lang.Character.toUpperCase(s.charAt(i + 1)))
          sb.append(java.lang.Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else { sb.append(c); i += 1 }
    }
    Some(sb.toString)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments, on an already-split path.
    * Operates on the path INCLUDING its leading '/'. */
  /** RFC 3986 §5.2.4 remove_dot_segments, verbatim — the segment-move
    * formulation preserves duplicate slashes (an empty segment is a
    * segment) and the trailing-slash semantics of "/.", "/..". */
  private def removeDotSegments(path: String): String = {
    var in = path
    val out = new java.lang.StringBuilder(path.length)
    def removeLastSeg(): Unit = {
      val idx = out.lastIndexOf("/")
      out.setLength(if (idx < 0) 0 else idx)
    }
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4); removeLastSeg()
      }
      else if (in == "/..") { in = "/"; removeLastSeg() }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        val end = if (next < 0) in.length else next
        out.append(in.substring(0, end))
        in = in.substring(end)
      }
    }
    val r = out.toString
    if (r.isEmpty) "/" else r
  }

  private[functions] def canonString(raw: String): String = {
    val sep = raw.indexOf("://")
    if (sep <= 0) return null
    val scheme = raw.substring(0, sep)
    var i = 0
    while (i < scheme.length) {
      val c = scheme.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (i > 0 && ((c >= '0' && c <= '9') || c == '+' || c == '-' ||
          c == '.'))
      if (!ok) return null
      i += 1
    }
    val schemeLc = scheme.toLowerCase(java.util.Locale.ROOT)
    val rest = raw.substring(sep + 3)
    // authority ends at the first /, ? or #
    var aEnd = rest.length
    var j = 0
    var found = false
    while (j < rest.length && !found) {
      val c = rest.charAt(j)
      if (c == '/' || c == '?' || c == '#') { aEnd = j; found = true }
      j += 1
    }
    val authority = rest.substring(0, aEnd)
    val afterAuth = rest.substring(aEnd)
    // userinfo kept verbatim (case-sensitive per spec), host/port split
    val at = authority.lastIndexOf('@')
    val userinfo = if (at >= 0) authority.substring(0, at + 1) else ""
    val hostPort = authority.substring(at + 1)
    val (host, port) = {
      val bracket = hostPort.lastIndexOf(']') // IPv6 literal
      val colon = hostPort.indexOf(':', math.max(bracket, 0))
      if (colon < 0) (hostPort, null)
      else (hostPort.substring(0, colon), hostPort.substring(colon + 1))
    }
    if (host.isEmpty) return null
    val hostLc = host.toLowerCase(java.util.Locale.ROOT)
    val portPart =
      if (port == null || port.isEmpty) "" // ":" with no digits drops
      else if (!port.forall(c => c >= '0' && c <= '9')) return null
      else if (defaultPorts.get(schemeLc).contains(
        port.dropWhile(_ == '0') match { case "" => "0"; case p => p }))
        ""
      else ":" + (port.dropWhile(_ == '0') match {
        case "" => "0"; case p => p
      })
    // split path / query / fragment
    val qIdx = afterAuth.indexOf('?')
    val hIdx = afterAuth.indexOf('#')
    val pathEnd =
      if (qIdx >= 0 && (hIdx < 0 || qIdx < hIdx)) qIdx
      else if (hIdx >= 0) hIdx
      else afterAuth.length
    val rawPath = afterAuth.substring(0, pathEnd)
    val rawQuery =
      if (qIdx >= 0 && (hIdx < 0 || qIdx < hIdx))
        afterAuth.substring(qIdx + 1,
          if (hIdx > qIdx) hIdx else afterAuth.length)
      else null
    val path0 = pctNormalize(
      if (rawPath.isEmpty) "/" else rawPath) match {
      case Some(p) => p
      case None => return null
    }
    val path = removeDotSegments(path0)
    val queryPart = if (rawQuery == null || rawQuery.isEmpty) ""
    else {
      // (key, value, bare): "a" stays bare, "a=" keeps its empty "="
      val kept =
        scala.collection.mutable.ArrayBuffer[(String, String, Boolean)]()
      for (p <- rawQuery.split("&", -1) if p.nonEmpty) {
        val eq = p.indexOf('=')
        val (k0, v0, bare) =
          if (eq < 0) (p, "", true)
          else (p.substring(0, eq), p.substring(eq + 1), false)
        val k = pctNormalize(k0) match {
          case Some(x) => x; case None => return null
        }
        val v = pctNormalize(v0) match {
          case Some(x) => x; case None => return null
        }
        if (!trackingParam(k)) kept += ((k, v, bare))
      }
      if (kept.isEmpty) ""
      else "?" + kept.map {
        case (k, _, true) => k
        case (k, v, false) => s"$k=$v"
      }.sorted.mkString("&") // rendered-form byte order: input-order-free
    }
    schemeLc + "://" + userinfo + hostLc + portPart + path + queryPart
  }

  def canon(s: UTF8String): UTF8String = {
    val r = canonString(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  private def isIpLiteral(host: String): Boolean =
    (host.nonEmpty && host.charAt(0) == '[') || // IPv6
      host.split("\\.", -1).forall(l =>
        l.nonEmpty && l.forall(c => c >= '0' && c <= '9'))

  private[functions] def registeredDomainString(raw: String): String = {
    // accept a full URL or a bare host
    val host0 = {
      val sep = raw.indexOf("://")
      if (sep >= 0) {
        val c = canonString(raw)
        if (c == null) return null
        val rest = c.substring(c.indexOf("://") + 3)
        var end = rest.length
        var j = 0; var found = false
        while (j < rest.length && !found) {
          val ch = rest.charAt(j)
          if (ch == '/' || ch == '?' || ch == '#') { end = j; found = true }
          j += 1
        }
        val auth = rest.substring(0, end)
        val at = auth.lastIndexOf('@')
        val hp = auth.substring(at + 1)
        val bracket = hp.lastIndexOf(']')
        val colon = hp.indexOf(':', math.max(bracket, 0))
        if (colon < 0) hp else hp.substring(0, colon)
      } else {
        // bare host may still carry :port (and IPv6 brackets) — split
        // it off like the URL branch; trailing-dot handling stays with
        // the shared single stripSuffix below so "example.com.." nulls
        // consistently on both branches. A colon AFTER a ']' or the
        // ONLY colon in the string is a port separator; two-plus
        // colons with no bracket is an unbracketed IPv6 literal, which
        // must pass through whole, not truncate at "2001" (review r17)
        val lc = raw.toLowerCase(java.util.Locale.ROOT)
        val bracket = lc.lastIndexOf(']')
        val colon = lc.indexOf(':', math.max(bracket, 0))
        val single = colon >= 0 && lc.indexOf(':', colon + 1) < 0
        if (colon >= 0 && (bracket >= 0 || single)) lc.substring(0, colon)
        else lc
      }
    }
    val host = host0.stripSuffix(".")
    if (host.isEmpty) return null
    if (isIpLiteral(host)) return host
    val labels = host.split("\\.", -1)
    if (labels.exists(_.isEmpty)) return null
    if (labels.length < 2) return host
    val lastTwo = labels(labels.length - 2) + "." + labels(labels.length - 1)
    if (twoLabelSuffixes.contains(lastTwo)) {
      if (labels.length < 3) return null // the suffix itself: no domain
      labels(labels.length - 3) + "." + lastTwo
    } else lastTwo
  }

  def registeredDomain(s: UTF8String): UTF8String = {
    val r = registeredDomainString(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  def canonicalUrl(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(CanonicalUrlExpr(ColumnBridge.expression(c)))
  }

  def registeredDomainCol(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(RegisteredDomainExpr(ColumnBridge.expression(c)))
  }
}
