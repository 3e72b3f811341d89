package graft.plans

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass URL decomposition (SURVEY.md §2.8 `fn_url` / §2.10
  * `expr_custom`).
  *
  * Spark's built-in `parse_url(url, part)` constructs and parses a
  * `java.net.URI` per CALL — a query projecting scheme+host+path+param
  * pays four full parses per row. A crawl-normalization pipeline touches
  * every URL in the corpus, so at 100 TB that constant matters. This
  * kernel parses once and emits all four parts as
  * `ARRAY<STRING>[scheme, host, path, param]`; per-part semantics match
  * `ParseUrl` exactly (verified in UrlExprSpec): `getScheme`/`getHost`/
  * `getRawPath` on the parsed URI, query-param extraction with the same
  * `(&|^)key=([^&]*)` regex over `getRawQuery`, NULL parts on a missing
  * component, all-NULL parts on an unparseable URL.
  */
object UrlKernels {
  private val patterns = new ConcurrentHashMap[String, Pattern]()

  private def patternFor(key: String): Pattern =
    patterns.computeIfAbsent(
      key, k => Pattern.compile("(&|^)" + Pattern.quote(k) + "=([^&]*)"))

  /** All four parts in one parse; element i is NULL when that part is
    * absent; all elements NULL when the URL does not parse.
    *
    * Two tiers (round 10 — fn_url was the one row reading SLOWER than
    * r8 normalized, and its cost was pure allocation: a String decode,
    * a `java.net.URI` object graph, a regex Matcher and four String
    * re-encodes per row):
    *  - FAST PATH: a single byte scan over the UTF8String for the shape
    *    crawl corpora overwhelmingly contain — pure-ASCII
    *    `scheme://host/path?query#frag` with no userinfo, no port, and
    *    host restricted to [A-Za-z0-9.-] (exactly the charset where
    *    `java.net.URI.getHost` is total). Parts come out as ZERO-COPY
    *    `UTF8String.substring` slices; the only allocation is the
    *    4-slot output array.
    *  - FALLBACK: anything unusual (no "://", empty/odd authority,
    *    '@' or ':' in the authority, a non-ASCII byte) takes the
    *    original URI parse, so semantics stay pinned to `parse_url`
    *    (UrlExprSpec asserts part-for-part equality on edge cases —
    *    userinfo, ports, escapes, fragments, relative, unparseable —
    *    AND on the full fixture corpus). */
  def parts(url: UTF8String, queryKey: String): ArrayData = {
    val fast = fastParts(url, queryKey)
    if (fast != null) fast else slowParts(url, queryKey)
  }

  private def isSchemeByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '+' || b == '-' || b == '.'

  private def isHostByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '.'

  /** RFC 3986 bytes legal after the authority (pchar ∪ "/?" — the
    * path/query/fragment alphabet). '%' and '#' are validated
    * separately; anything OUTSIDE this set (space, '"', '<', '|', '^',
    * braces, backslash, …) makes `java.net.URI` throw, so such URLs
    * must take the slow path to keep fn_url's all-NULL contract for
    * malformed crawl URLs (ADVICE r10 #3 — the round-10 fast path
    * accepted any ASCII byte here and returned parsed parts where the
    * fallback returns NULLs). */
  private val legalTailByte: Array[Boolean] = {
    val t = new Array[Boolean](128)
    for (c <- 'a' to 'z') t(c) = true
    for (c <- 'A' to 'Z') t(c) = true
    for (c <- '0' to '9') t(c) = true
    "-._~!$&'()*+,;=:@/?".foreach(c => t(c) = true)
    t
  }

  private def isHexByte(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'a' && b <= 'f') || (b >= 'A' && b <= 'F')

  /** The zero-copy scan; returns null when the URL needs the URI
    * fallback. For pure-ASCII input, code-point indices == byte
    * indices, so `substring` slices are exact. */
  private def fastParts(url: UTF8String, queryKey: String): ArrayData = {
    val n = url.numBytes
    var i = 0
    while (i < n) { if (url.getByte(i) < 0) return null; i += 1 } // ASCII only
    // scheme://
    var s = 0
    while (s < n && url.getByte(s) != ':') {
      if (!isSchemeByte(url.getByte(s))) return null
      s += 1
    }
    if (s == 0 || s + 2 >= n || url.getByte(s) != ':' ||
      url.getByte(s + 1) != '/' || url.getByte(s + 2) != '/') return null
    val b0 = url.getByte(0)
    if (!((b0 >= 'a' && b0 <= 'z') || (b0 >= 'A' && b0 <= 'Z'))) return null
    // authority: [A-Za-z0-9.-]+ only (no userinfo/port/IPv6 → fallback)
    val hostStart = s + 3
    var h = hostStart
    while (h < n && url.getByte(h) != '/' && url.getByte(h) != '?' &&
      url.getByte(h) != '#') {
      if (!isHostByte(url.getByte(h))) return null
      h += 1
    }
    if (h == hostStart) return null // empty authority: URI semantics differ
    // validate the tail (path+query+fragment) against the RFC 3986
    // alphabet: %XX escapes need two hex digits, at most one '#', and
    // every other byte must be in the legal set — else the URI
    // fallback's rejection semantics apply
    var j = h
    var hashes = 0
    while (j < n) {
      val b = url.getByte(j)
      if (b == '#') { hashes += 1; if (hashes > 1) return null }
      else if (b == '%') {
        if (j + 2 >= n || !isHexByte(url.getByte(j + 1)) ||
          !isHexByte(url.getByte(j + 2))) return null
        j += 2
      } else if (!legalTailByte(b)) return null
      j += 1
    }
    // path: up to '?' or '#'
    var p = h
    while (p < n && url.getByte(p) != '?' && url.getByte(p) != '#') p += 1
    // query: present only when '?' precedes any '#'
    var qEnd = p
    if (p < n && url.getByte(p) == '?') {
      qEnd = p + 1
      while (qEnd < n && url.getByte(qEnd) != '#') qEnd += 1
    }
    val out = new Array[Any](4)
    out(0) = url.substring(0, s)
    out(1) = url.substring(hostStart, h)
    out(2) = url.substring(h, p) // "" when no path — matches getRawPath
    if (p < n && url.getByte(p) == '?' && queryKey != null)
      out(3) = queryValue(url, p + 1, qEnd, queryKey)
    new GenericArrayData(out)
  }

  /** First `key=` at the query start or after '&'; value runs to the
    * next '&' — the same semantics as the fallback's
    * `(&|^)key=([^&]*)` regex. */
  private def queryValue(url: UTF8String, qStart: Int, qEnd: Int,
      key: String): UTF8String = {
    val kLen = key.length
    var at = qStart
    while (at + kLen < qEnd) {
      if (at == qStart || url.getByte(at - 1) == '&') {
        var k = 0
        while (k < kLen && url.getByte(at + k) == key.charAt(k).toByte) k += 1
        if (k == kLen && url.getByte(at + kLen) == '=') {
          var v = at + kLen + 1
          while (v < qEnd && url.getByte(v) != '&') v += 1
          return url.substring(at + kLen + 1, v)
        }
      }
      at += 1
    }
    null
  }

  private def slowParts(url: UTF8String, queryKey: String): ArrayData = {
    val out = new Array[Any](4)
    try {
      val uri = new java.net.URI(url.toString)
      if (uri.getScheme != null) out(0) = UTF8String.fromString(uri.getScheme)
      if (uri.getHost != null) out(1) = UTF8String.fromString(uri.getHost)
      if (uri.getRawPath != null) out(2) = UTF8String.fromString(uri.getRawPath)
      val q = uri.getRawQuery
      if (q != null && queryKey != null) {
        val m = patternFor(queryKey).matcher(q)
        if (m.find()) out(3) = UTF8String.fromString(m.group(2))
      }
    } catch { case _: java.net.URISyntaxException => () }
    new GenericArrayData(out)
  }
}

/** url_parts(url): ARRAY<STRING>[scheme, host, path, value-of-queryKey]
  * from a single URI parse. */
case class UrlPartsExpr(child: Expression, queryKey: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "url_parts"
  override def nullSafeEval(input: Any): Any =
    UrlKernels.parts(input.asInstanceOf[UTF8String], queryKey)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val key = ctx.addReferenceObj("queryKey", queryKey, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.plans.UrlKernels.parts($c, $key)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UrlExpressions {
  def urlParts(url: Column, queryKey: String): Column =
    ColumnBridge.column(UrlPartsExpr(ColumnBridge.expression(url), queryKey))
}
