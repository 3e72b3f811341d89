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
    * absent; all elements NULL when the URL does not parse. */
  def parts(url: UTF8String, queryKey: String): ArrayData = {
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
