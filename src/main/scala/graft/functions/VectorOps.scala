package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ARRAY<FLOAT>` columns via codegen'd
  * higher-order functions — no UDFs in the hot path (SURVEY.md §2.11).
  *
  * All arithmetic is done in DOUBLE with a strict left-to-right fold so
  * results are bit-reproducible and match an oracle computing the same
  * sequential sum. A fused custom Catalyst `Expression` (doGenCode) is the
  * declared fast path if profiling shows the HOF version bottlenecks
  * (SURVEY.md §4.3) — same Column signature, drop-in.
  */
object VectorOps {

  /** Sequential-fold dot product in DOUBLE — the codegen'd custom
    * expression ([[graft.plans.DotProductFloat]]). Same semantics as the
    * HOF composition below, ~10-100× faster on all-pairs joins because
    * higher-order functions evaluate interpreted while this fuses into
    * WholeStageCodegen. */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotProduct(a, b)

  /** The composable HOF form (kept as the reference semantics the custom
    * expression must match — see VectorExprSpec). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Sum of squares (self dot). */
  def norm2(a: Column): Column = dot(a, a)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity; null-safe for zero vectors is the caller's concern
    * (fixture vectors are non-zero). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** max(|x|) over the vector — the symmetric-quantization range. */
  def absMax(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Per-vector symmetric int8 quantization scale (absMax/127). The
    * all-zero vector has absMax 0 — clamped to a tiny positive floor so
    * [[quantizeInt8]] yields 0/tiny = 0 codes instead of a 0/0 division
    * (an ANSI-mode error; with ANSI off, NaN codes whose engine-dependent
    * equality would poison a groupBy). The floor is 1e-300, not
    * `Double.MinPositiveValue`: the subnormal minimum UNDERFLOWS back to
    * exactly 0 when divided by 127. Any vector with a representable
    * non-zero element has absMax ≥ ~1e-45 (float), far above the floor,
    * so `greatest` returns absMax unchanged and the oracle arithmetic is
    * bit-identical. */
  def int8Scale(a: Column): Column =
    greatest(absMax(a), lit(1e-300)) / lit(127.0)

  /** Quantize to int8 codes with the given per-vector scale:
    * `floor(x/scale + 0.5)` — explicit half-up rounding in pure IEEE
    * double arithmetic, bit-reproducible across engines (the same reason
    * Num.r4 avoids `round`). Elements are LONG for cross-engine schema
    * agreement; values fit [-127, 127].
    *
    * Storage view: 64 floats (256 B) become 64 int8 codes + one float
    * scale (~68 B) — the standard 4× embedding-store compression. The
    * arithmetic is per-row and narrow (zero shuffle); at 100 TB the HOF
    * pair here is the semantics reference, and a fused codegen kernel à la
    * [[graft.plans.VectorExpressions]] is the declared fast path if the
    * quantize pass ever dominates a profile. */
  def quantizeInt8(a: Column, scale: Column): Column =
    transform(a, x => floor(x.cast("double") / scale + lit(0.5)))

  /** Deterministic ±1 random-projection matrix (Achlioptas 2003 with the
    * dense sign variant): `signs(j)(i)` is the sign applied to input
    * dim `i` for output dim `j`, derived from MD5 of `"i:j:salt"` — no
    * RNG, reproducible in any engine or language, so an oracle can carry
    * the identical literal matrix. */
  def rpSigns(outDim: Int, inDim: Int, salt: String = "rp"): Array[Array[Float]] =
    Array.tabulate(outDim) { j =>
      Array.tabulate(inDim) { i =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$i:$j:$salt".getBytes("UTF-8"))
        if ((d(0) & 0x80) != 0) -1f else 1f
      }
    }

  /** Johnson–Lindenstrauss sign random projection to `outDim` dims: each
    * output component is one codegen'd [[dot]] against a LITERAL sign
    * vector — a narrow zero-shuffle projection (the standard prelude to
    * cheaper ANN / clustering on 4-8× shorter vectors; distances are
    * preserved within 1±ε by JL). The sign matrix is [[rpSigns]] —
    * deterministic, so both the engine and any oracle evaluate the
    * identical ±v(i) sum in the identical order. */
  def projectRp(vec: Column, outDim: Int, inDim: Int, salt: String = "rp"): Seq[Column] =
    rpSigns(outDim, inDim, salt).toSeq.map { s =>
      dot(vec, typedlit[Seq[Float]](s.toSeq))
    }
}
