package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Language-ID expressions (SURVEY.md §2.11 text analysis).
  *
  * The scale pattern here is broadcast-literal model scoring: the trained
  * trigram profile is tiny (langs × topM rows), so instead of joining the
  * corpus against it — an explode of every trigram occurrence plus two
  * aggregate shuffles per 100 TB scoring pass — the profile is collected
  * once and baked into a [[LangScoreExpr]], turning classification into a
  * zero-shuffle projection. The relational form stays as the cross-check
  * (LangId.selfLabelPredictRelational, equality in MultimodalLangIdSpec).
  */

/** Immutable trained profile: `hashes` sorted ascending for binary search,
  * `weights`/`langIdx` parallel to it; `langs` indexed by langIdx. */
final class LangProfile(val hashes: Array[Long], val weights: Array[Double],
    val langIdx: Array[Int], val langs: Array[String]) extends Serializable {

  /** Best-scoring language for `text` (score = Σ weight per trigram
    * occurrence; ties broken toward the lexicographically greatest
    * language, matching `max_by(lang, struct(score, lang))`). Null when
    * no trigram hits the profile. */
  def score(text: UTF8String): UTF8String = {
    val b = text.toLowerCase.getBytes
    // codepoint starts (UTF-8 continuation bytes are 0x80..0xBF)
    val nBytes = b.length
    val scores = new Array[Double](langs.length)
    var hit = false
    var i = 0
    var c0 = 0 // byte offsets of a sliding 4-codepoint window
    var c1 = -1
    var c2 = -1
    var c3 = -1
    while (i <= nBytes) {
      val isStart = i == nBytes || (b(i) & 0xC0) != 0x80
      if (isStart) {
        c0 = c1; c1 = c2; c2 = c3; c3 = i
        if (c0 >= 0) { // a full trigram [c0, c3)
          val h = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET + c0, c3 - c0, 42L)
          val p = java.util.Arrays.binarySearch(hashes, h)
          if (p >= 0) {
            // walk duplicates (same trigram can appear in several langs)
            var q = p
            while (q > 0 && hashes(q - 1) == h) q -= 1
            while (q < hashes.length && hashes(q) == h) {
              scores(langIdx(q)) += weights(q)
              hit = true
              q += 1
            }
          }
        }
      }
      i += 1
    }
    if (!hit) return null
    var best = 0
    var j = 1
    while (j < langs.length) {
      if (scores(j) > scores(best) ||
        (scores(j) == scores(best) && langs(j).compareTo(langs(best)) > 0)) best = j
      j += 1
    }
    UTF8String.fromString(langs(best))
  }
}

/** lang_score(text): classify one document against a baked-in profile. */
case class LangScoreExpr(child: Expression, profile: LangProfile)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "lang_score"

  override def nullSafeEval(input: Any): Any =
    profile.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("langProfile", profile, classOf[LangProfile].getName)
      s"""
         |${ev.value} = $ref.score($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** trigram_counts(text): ARRAY<STRUCT<gram STRING, cnt INT>> of distinct
  * character trigrams of lower(text) with occurrence counts — the per-row
  * substitute for exploding every trigram occurrence before the profile
  * aggregate (rows shrink to distinct-per-doc, and the per-doc counting
  * shuffle disappears). */
case class TrigramCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("gram", StringType, nullable = false),
      StructField("cnt", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "trigram_counts"

  override def nullSafeEval(input: Any): Any =
    TextKernels.trigramCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.trigramCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdExpressions {
  def langScore(text: Column, profile: LangProfile): Column =
    ColumnBridge.column(LangScoreExpr(ColumnBridge.expression(text), profile))

  def trigramCounts(text: Column): Column =
    ColumnBridge.column(TrigramCountsExpr(ColumnBridge.expression(text)))

  /** Build the scoring profile from collected (lang, gram, weight) rows. */
  def buildProfile(rows: Array[(String, String, Double)]): LangProfile = {
    val langs = rows.map(_._1).distinct.sorted
    val li = langs.zipWithIndex.toMap
    val sorted = rows.map { case (l, g, w) =>
      (XXH64.hashUTF8String(UTF8String.fromString(g), 42L), w, li(l))
    }.sortBy(_._1)
    new LangProfile(sorted.map(_._1), sorted.map(_._2), sorted.map(_._3), langs)
  }
}
