package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale paths for joins whose predicate is not an equi-key:
  *
  *  - [[BloomJoin.semiWithBloom]] — semi/existence join where the lookup
  *    side is too large to broadcast as a hash relation but its Bloom
  *    sketch (~10 bits/key at 1% FP) still fits: pre-filter the big side
  *    with the broadcast sketch, then run the exact join on the survivors.
  *    Result-identical to the plain semi-join (false positives are removed
  *    by the exact join), which is why the plain join's SQL is the oracle.
  *
  *  - [[RangeJoin.overlapSelfBucketed]] — interval-overlap self-join with
  *    NO equi key. The naive plan is a broadcast-nested-loop (O(n²) work,
  *    one side broadcast whole); the scale shape decomposes time into
  *    fixed buckets, replicates each interval to the buckets it touches
  *    (bounded by interval_len/bucket + 2), and equi-joins on the bucket.
  *    Each overlapping pair meets in every shared bucket, so the join
  *    keeps only the canonical one — the bucket containing the later
  *    start — making the output duplicate-free WITHOUT a distinct pass.
  */
object RangeJoin {

  /** Pairs (a, b) of `intervals` rows with `a.idCol < b.idCol` whose
    * half-open intervals `[startCol, startCol+len)` overlap, computed as a
    * bucketed equi-join. `startCol` is an integral day/hour/slot index —
    * negative values are fully supported (`floor(col/bucket)` is true
    * floor division, so pre-epoch indices land in the right bucket; the
    * production caller feeds TPC-H dates before its 1995 epoch as
    * negative days); `len` and `bucket` are in the same unit.
    *
    * Returns the joined frame with every `a.*` column prefixed `a_` and
    * every `b.*` prefixed `b_`. Shuffle: both replicated sides hash on
    * `bkt` — bucket size should be chosen ≈ interval length so the
    * replication factor stays ≤ 2 and each bucket's population is bounded
    * (at 100 TB, add the start-bucket to the hash key salt if one bucket
    * is hot). Never O(n²): work is Σ_bucket |bucket|². */
  def overlapSelfBucketed(intervals: DataFrame, idCol: String,
      startCol: String, len: Int, bucket: Int): DataFrame = {
    require(len > 0 && bucket > 0)
    // interval [s, s+len) touches buckets floor(s/b) .. floor((s+len-1)/b)
    val withBkt = intervals.withColumn("bkt",
      explode(sequence(floor(col(startCol) / bucket),
        floor((col(startCol) + lit(len - 1)) / bucket))))
    val a = withBkt.select(withBkt.columns.toIndexedSeq.map(c => col(c).as(s"a_$c")): _*)
    val b = withBkt.select(withBkt.columns.toIndexedSeq.map(c => col(c).as(s"b_$c")): _*)
    a.join(b,
      col("a_bkt") === col("b_bkt") &&
      col(s"a_$idCol") < col(s"b_$idCol") &&
      // overlap of [a_s, a_s+len) and [b_s, b_s+len)
      col(s"a_$startCol") < col(s"b_$startCol") + len &&
      col(s"b_$startCol") < col(s"a_$startCol") + len &&
      // canonical bucket: the one holding the later start — dedup-free
      col("a_bkt") === floor(greatest(col(s"a_$startCol"), col(s"b_$startCol")) / bucket))
  }
}

/** Multidimensional box (ε-range) self-join by GRID-CELL decomposition —
  * the 2-D generalization of [[RangeJoin.overlapSelfBucketed]]'s
  * bucketing: all pairs with |Δx| ≤ εx AND |Δy| ≤ εy. The spatial-join /
  * blocking primitive behind "near-identical records" detection when
  * similarity is a conjunction of per-attribute tolerances.
  *
  * Shape: each point gets a grid cell (floor(x/εx), floor(y/εy)); a
  * qualifying pair's cells differ by ≤ 1 per dimension, so the LEFT side
  * replicates to its 3×3 cell neighborhood and equi-joins the
  * unreplicated right side on the cell pair. DUP-FREE WITHOUT DISTINCT:
  * the right point lives in exactly ONE cell and each left replica
  * targets each cell at most once, so a pair meets exactly once; the
  * id < id guard orients it. Candidate mass is Σ_cells 9·|cell|² — the
  * grid bounds it the way a sort-merge band join cannot for two
  * simultaneous dimensions. The 9× replication ships (id, x, y, cell)
  * only. One co-keyed exchange per side; the exact box filter runs
  * before any output materializes. */
object BoxJoin {
  def selfJoin2d(df: DataFrame, idCol: String, xCol: String, yCol: String,
      epsX: Double, epsY: Double): DataFrame = {
    require(epsX > 0 && epsY > 0, "box tolerances must be positive")
    val pts = df.select(col(idCol).as("id"),
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .withColumn("cx", floor(col("x") / epsX).cast("long"))
      .withColumn("cy", floor(col("y") / epsY).cast("long"))
    val offsets = for (i <- -1 to 1; j <- -1 to 1)
      yield struct(lit(i.toLong).as("dx"), lit(j.toLong).as("dy"))
    val repl = pts.select(col("id").as("a_id"), col("x").as("ax"),
        col("y").as("ay"), explode(array(offsets: _*)).as("o"),
        col("cx"), col("cy"))
      .select(col("a_id"), col("ax"), col("ay"),
        (col("cx") + col("o.dx")).as("cx"), (col("cy") + col("o.dy")).as("cy"))
    repl.join(
        pts.select(col("id").as("b_id"), col("x").as("bx"), col("y").as("by"),
          col("cx"), col("cy")),
        Seq("cx", "cy"))
      .filter(col("a_id") < col("b_id"))
      .filter(abs(col("ax") - col("bx")) <= epsX &&
        abs(col("ay") - col("by")) <= epsY)
      .select(col("a_id"), col("b_id"),
        abs(col("ax") - col("bx")).as("dx"),
        abs(col("ay") - col("by")).as("dy"))
  }
}

object BloomJoin {

  /** `left SEMI JOIN keys` with a Bloom pre-filter: build the sketch over
    * `xxhash64(keys[keyRight])` with Spark's own `BloomFilterAggregate`
    * (one aggregation, fixed-size mergeable buffers — numBits/8 bytes per
    * partial), then probe with the codegen'd `BloomFilterMightContain` —
    * the exact expression pair Spark's runtime row-level filters inject.
    * The probe therefore stays INSIDE whole-stage codegen on the 100 TB
    * fact side (no boxed per-row UDF; PlanAuditSpec asserts no ScalaUDF in
    * the probe filter), and any xxhash64-able key type works — integral,
    * string, double, date — not just the integral/string pair the old
    * `stat.bloomFilter` path supported.
    *
    * Key-type skew between the two sides is normalized BEFORE hashing
    * (xxhash64 is width-sensitive: the same value hashes differently as
    * INT vs BIGINT): integral-vs-integral both widen to BIGINT and
    * numeric-vs-numeric both widen to DOUBLE — both casts are functions of
    * the numeric VALUE alone, so two keys the join's type coercion deems
    * equal always hash identically and no true match is ever dropped (a
    * rounding alias can only ADD a false positive, which the exact join
    * removes). Any other mixed-type pair (string-vs-numeric, date-vs-
    * string, …) compares under engine- and ANSI-mode-dependent coercion —
    * e.g. under ANSI, build STRING "007" join-matches probe BIGINT 7, but
    * xxhash64("007") ≠ xxhash64("7"), so ANY single-type hash would drop
    * the match. For those pairs the sketch is skipped entirely and the
    * plain semi-join runs — result-identity is the contract; the sketch is
    * only an optimization.
    *
    * The sketch build collects ONE binary blob (bounded: optimal-bits for
    * `expectedItems` at `fpp`, further capped by Spark's
    * `runtime.bloomFilter.maxNumBits` inside the aggregate — past the cap
    * the fpp degrades, costing only shuffled bytes), never the keys. At
    * 100 TB this is the standard shape for "join a fact to a 10⁹-key dim":
    * the dim's hash relation (~16 B/key) blows the broadcast budget 10×
    * sooner than its Bloom sketch does, and the pre-filter cuts the fact's
    * shuffle volume by the join's selectivity. False positives only cost
    * shuffled bytes — the exact join removes them, so results are
    * bit-identical to the plain semi-join. */
  def semiWithBloom(left: DataFrame, leftKey: String,
      keys: DataFrame, keyRight: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types._
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")

    val lt = left.schema(leftKey).dataType
    val rt = keys.schema(keyRight).dataType
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    def numeric(t: DataType): Boolean = t.isInstanceOf[NumericType]
    // A shared hash type is only safe when the cast to it is a function of
    // the key's VALUE under the join's own coercion — otherwise two keys
    // the join deems equal can hash apart and the sketch drops true
    // matches. Same-type, integral→BIGINT, and numeric→DOUBLE qualify;
    // everything else (e.g. STRING vs BIGINT) does not → None = no sketch.
    val hashKeys: Option[(Column, Column)] =
      if (lt == rt) Some((col(leftKey), keys(keyRight)))
      else if (integral(lt) && integral(rt))
        Some((col(leftKey).cast(LongType), keys(keyRight).cast(LongType)))
      else if (numeric(lt) && numeric(rt))
        Some((col(leftKey).cast(DoubleType), keys(keyRight).cast(DoubleType)))
      else None
    if (hashKeys.isEmpty) {
      return left.join(keys, col(leftKey) === keys(keyRight), "left_semi")
    }
    val (probeKey, buildKey) = hashKeys.get

    // classic optimal sizing m = -n·ln(p)/ln²2 (~10 bits/key at 1% fpp)
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val sketch = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(buildKey)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    val bytes = keys.select(sketch).head().getAs[Array[Byte]](0)
    if (bytes == null) {
      // empty build side: the semi-join is empty by definition — skip the
      // probe (BloomFilterMightContain on a null sketch is undefined)
      left.filter(lit(false)).join(keys, col(leftKey) === keys(keyRight), "left_semi")
    } else {
      val probe = ColumnBridge.column(BloomFilterMightContain(
        Literal(bytes, BinaryType),
        ColumnBridge.expression(xxhash64(probeKey))))
      left.filter(col(leftKey).isNotNull && probe)
        .join(keys, col(leftKey) === keys(keyRight), "left_semi")
    }
  }
}
