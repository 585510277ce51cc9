package graft.functions

import org.apache.spark.sql.{Column, GraftSqlInternals}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native (whole-stage-codegen) sketch kernels for the dedup / ANN hot paths.
 *
 * Why: the MinHash family loop (`transform(sequence(0,H-1), h ->
 * array_min(transform(hs, x -> …)))`), the SimHash bit-vote
 * (`aggregate(sequence(0,63), …)` re-scanning every token per bit), the
 * hyperplane sign signature (bands × bits × dim) and the hash bag-of-words
 * embedding (dim × tokens) are all interpreted higher-order-function
 * pyramids: every lambda evaluation is a virtual call outside whole-stage
 * codegen, and each level materializes an intermediate array per row.
 * These four loops ARE the per-document cost of `Dedup.minHashLsh`,
 * `Dedup.simHashPairs`, `Similarity.lshTopK` / `cosineNearDupPairs`, and
 * `vectors.HashEmbedder` — the same preference-order argument as
 * [[CosineSimilarity]] (measured 17.8× there).
 *
 * Numerical contract — each kernel is BIT-IDENTICAL to the SQL form it
 * replaces, for both hash families:
 *  - portable (oracle-replayable): pure integer/long arithmetic with Java
 *    wrap-around and truncated `%`, exactly Spark's non-ANSI semantics; the
 *    DuckDB oracle replays are untouched because the values are unchanged
 *    (asserted per family in `HashExpressionsSpec` against the retained SQL
 *    forms).
 *  - xxhash64 (default, better mixing): the kernels call the same
 *    [[XXH64]] statics Spark's `xxhash64` codegen emits, folding children in
 *    the same order with the same int/long typing (`xxhash64(x, h)` =
 *    `hashInt(h, hashLong(x, 42))` for long x and int h from `sequence`).
 * Degenerate-input behavior is also matched case by case: `array_min` skips
 * nulls but `xxhash64(null, h)` is `hashInt(h, 42)` (null SKIPPED in the
 * fold, not propagated); the SimHash vote treats a null token hash as −1
 * (`CASE WHEN null THEN … ELSE -1`); a null vector element zeroes the plane
 * signature (null poisons each bit's dot product); a null token value nulls
 * every embedding dimension.
 *
 * ONE deliberate divergence (pinned in `HashExpressionsSpec`): on a NULL
 * input ARRAY (null text upstream) the kernels return NULL, where the SQL
 * pyramids produced degenerate non-null shells — an array of H nulls
 * (MinHash), fingerprint 0 (SimHash, colliding null docs with empty docs),
 * an array of dim nulls (embed). NULL composes better: the LSH band
 * explode drops null docs instead of bucketing every null-text document
 * into one hot candidate bucket.
 *
 * The heavy loops live in [[HashKernels]] statics shared verbatim by
 * `eval` and the generated code, so interpreted and codegen paths cannot
 * diverge.
 */
object HashExpressions {

  /** MinHash signature (array<bigint>, length `numHashes`) of a base-hash
    * array column — replaces the per-h `array_min(transform(…))` pyramid in
    * [[graft.ml.Dedup.withMinHash]]. */
  def minHashSig(baseHashes: Column, numHashes: Int, portable: Boolean): Column =
    GraftSqlInternals.column(
      MinHashSignature(GraftSqlInternals.expression(baseHashes), numHashes, portable))

  /** 64-bit (63-bit portable) SimHash fingerprint of a token-hash array
    * column — replaces the per-bit token re-scan in
    * [[graft.ml.Dedup.withSimHash]]. */
  def simHash(tokenHashes: Column, portable: Boolean): Column =
    GraftSqlInternals.column(
      SimHash64(GraftSqlInternals.expression(tokenHashes), portable))

  /** `bits`-bit random-hyperplane sign signature of a vector column for band
    * `band` — replaces the bits × dim lambda pyramid in
    * [[graft.ml.Similarity]]'s `planeSigSql`. */
  def planeSig(vec: Column, band: Column, bits: Int, seed: Long, portable: Boolean): Column =
    GraftSqlInternals.column(
      PlaneSignature(
        GraftSqlInternals.expression(vec), GraftSqlInternals.expression(band),
        bits, seed, portable))

  /** Hash bag-of-words embedding (array<double>, length `dim`) of a
    * token-value array column — the [[graft.vectors.HashEmbedder]] kernel. */
  def hashEmbed(tokenValues: Column, dim: Int, seed: Long, portable: Boolean): Column =
    GraftSqlInternals.column(
      HashEmbed(GraftSqlInternals.expression(tokenValues), dim, seed, portable))

  /** Rolling token-window hashes (array<bigint>, length max(0, T−width+1))
    * of a token-hash array column — the window census of
    * [[graft.ml.Dedup.duplicateSpans]] (exact substring dedup). */
  def windowHashes(tokenHashes: Column, width: Int, portable: Boolean): Column =
    GraftSqlInternals.column(
      WindowHashes(GraftSqlInternals.expression(tokenHashes), width, portable))

  /** Count of positions where two arrays are both non-null and equal —
    * replaces `size(filter(zip_with(a, b, (x,y) -> x = y), v -> v))` in the
    * LSH Jaccard estimate (per candidate pair). */
  def eqCount(a: Column, b: Column): Column =
    GraftSqlInternals.column(
      ArrayEqCount(GraftSqlInternals.expression(a), GraftSqlInternals.expression(b)))
}

/** Static loop bodies shared by interpreted `eval` and generated code (the
  * codegen emits a single static call per row — the loop itself is JIT'd
  * bytecode either way, so both paths are identical by construction). */
object HashKernels {

  val PolyP: Long = 1000000007L

  /** Portable family h_i(x) = ((1 + i·1000003)·x + i·999983 + 12345) % P,
    * min per i, nulls skipped (array_min semantics); empty/all-null ⇒ null
    * element. */
  def minHashPortable(hs: ArrayData, numHashes: Int): ArrayData = {
    val mins = new Array[Long](numHashes)
    var seen = false
    val n = hs.numElements()
    var j = 0
    while (j < n) {
      if (!hs.isNullAt(j)) {
        val x = hs.getLong(j)
        var h = 0
        while (h < numHashes) {
          // (1 + h*1000003) is int arithmetic in the SQL form; h is bounded
          // far below int overflow, the widening to long happens at ·x
          val v = (1L + h * 1000003L) * x + h * 999983L + 12345L
          val m = v % PolyP
          if (!seen || m < mins(h)) mins(h) = m
          h += 1
        }
        // `seen` flips only after the FIRST element initialized every slot
        if (!seen) seen = true
      }
      j += 1
    }
    if (!seen) {
      val out = new Array[Any](numHashes)
      new GenericArrayData(out) // all nulls — array_min over empty/all-null
    } else {
      val out = new Array[Any](numHashes)
      var h = 0
      while (h < numHashes) { out(h) = mins(h); h += 1 }
      new GenericArrayData(out)
    }
  }

  /** xxhash64 family: element value for index h is `xxhash64(x, h)` =
    * hashInt(h, hashLong(x, 42)); a NULL x is skipped by the hash fold, so
    * it contributes hashInt(h, 42) — matching Spark's `xxhash64(null, h)`,
    * not a skipped element. Empty array ⇒ null elements. */
  def minHashXx(hs: ArrayData, numHashes: Int): ArrayData = {
    val mins = new Array[Long](numHashes)
    var seen = false
    val n = hs.numElements()
    var j = 0
    while (j < n) {
      val t = if (hs.isNullAt(j)) 42L else XXH64.hashLong(hs.getLong(j), 42L)
      var h = 0
      while (h < numHashes) {
        val v = XXH64.hashInt(h, t)
        if (!seen || v < mins(h)) mins(h) = v
        h += 1
      }
      if (!seen) seen = true
      j += 1
    }
    if (!seen) {
      new GenericArrayData(new Array[Any](numHashes))
    } else {
      val out = new Array[Any](numHashes)
      var h = 0
      while (h < numHashes) { out(h) = mins(h); h += 1 }
      new GenericArrayData(out)
    }
  }

  /** Portable SimHash over bits 0..62: vote by pmod(h·(2b+17) + 7919, P) % 2;
    * null token hash votes −1 on every bit (CASE-null semantics). */
  def simHashPortable(th: ArrayData): Long = {
    val counts = new Array[Int](63)
    val n = th.numElements()
    var j = 0
    while (j < n) {
      if (th.isNullAt(j)) {
        var b = 0
        while (b < 63) { counts(b) -= 1; b += 1 }
      } else {
        val h = th.getLong(j)
        var b = 0
        while (b < 63) {
          val v = h * (2L * b + 17L) + 7919L
          var pm = v % PolyP
          if (pm < 0L) pm += PolyP
          if (pm % 2L == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 63) {
      if (counts(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** xxhash64-family SimHash over bits 0..63: vote by bit b of the token
    * hash; null token hash votes −1 on every bit. */
  def simHashXx(th: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = th.numElements()
    var j = 0
    while (j < n) {
      if (th.isNullAt(j)) {
        var b = 0
        while (b < 64) { counts(b) -= 1; b += 1 }
      } else {
        val h = th.getLong(j)
        var b = 0
        while (b < 64) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  private def lcg(mixed: Long): Double =
    ((mixed % PolyP) * 1103515245L + 12345L) % PolyP % 2000001L / 1000000.0 - 1.0

  /** Hyperplane sign signature. `isFloat`: element type of `vec`. A null
    * element poisons every bit's dot product (sig = 0), matching the
    * aggregate-over-null SQL semantics. */
  def planeSig(
      vec: ArrayData, isFloat: Boolean, band: Int, bits: Int, seed: Long,
      portable: Boolean): Long = {
    val n = vec.numElements()
    var i = 0
    while (i < n) { // null scan first: SQL nulls EVERY bit's sum
      if (vec.isNullAt(i)) return 0L
      i += 1
    }
    // xx chain: xxhash64(seed, b, bit, i) with int literals for b/bit/i and
    // an int-typed seed literal when it fits (the SQL writes the seed bare)
    val seedBase =
      if (!portable) {
        if (seed >= Int.MinValue && seed <= Int.MaxValue) XXH64.hashInt(seed.toInt, 42L)
        else XXH64.hashLong(seed, 42L)
      } else 0L
    val hBand = if (!portable) XXH64.hashInt(band, seedBase) else 0L
    var sig = 0L
    var bit = 0
    while (bit < bits) {
      val hBit = if (!portable) XXH64.hashInt(bit, hBand) else 0L
      var dot = 0.0
      i = 0
      while (i < n) {
        val v = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val comp =
          if (portable)
            lcg(seed + band * 73856093L + bit * 19349663L + i * 83492791L)
          else {
            val h = XXH64.hashInt(i, hBit)
            var pm = h % 2000001L
            if (pm < 0L) pm += 2000001L
            pm / 1000000.0 - 1.0
          }
        dot += v * comp
        i += 1
      }
      if (dot > 0.0) sig |= 1L << bit
      bit += 1
    }
    sig
  }

  /** Hash bag-of-words embedding: emb[i] = Σ_tokens comp(v, i), token order
    * preserved (identical fp fold order to the SQL form). A null token value
    * nulls every dimension (aggregate-over-null per dimension). */
  def hashEmbed(tv: ArrayData, dim: Int, seed: Long, portable: Boolean): ArrayData = {
    val n = tv.numElements()
    var j = 0
    while (j < n) {
      if (tv.isNullAt(j)) return new GenericArrayData(new Array[Any](dim))
      j += 1
    }
    val seedBase = if (!portable) XXH64.hashLong(seed, 42L) else 0L
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      var acc = 0.0
      j = 0
      while (j < n) {
        val v = tv.getLong(j)
        acc +=
          (if (portable) lcg(seed + v * 73856093L + i * 83492791L)
           else {
             val h = XXH64.hashInt(i, XXH64.hashLong(v, seedBase))
             var pm = h % 2000001L
             if (pm < 0L) pm += 2000001L
             pm / 1000000.0 - 1.0
           })
        j += 1
      }
      out(i) = acc
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  val PolyBandP: Long = 998244353L

  /** Hashes of every length-`width` token window: out(i) folds tokens
    * [i, i+width). Portable family: TWO independent folds
    * (7; acc·31 + x mod P₁) and (11; acc·37 + x mod P₂) combined as
    * h₁·P₂ + h₂ — a single ~2^30 modulus has EXPECTED birthday collisions
    * at ~10^5 windows (measured: 2 false duplicate spans on the 500-doc
    * corpus before the widening); the pair lifts the key space to ~2^60
    * while every step stays DuckDB-replayable integer arithmetic. A null
    * token nulls the window (fold-through-null). xxhash64 family: acc₀=42,
    * step `xxhash64(x, acc)` = hashLong(acc, hashLong(x, 42)) — a null
    * token contributes hashLong(acc, 42) (hash-fold null-skip).
    * Fewer than `width` tokens ⇒ empty array (no window). */
  def windowHashes(th: ArrayData, width: Int, portable: Boolean): ArrayData = {
    val t = th.numElements()
    val n = math.max(0, t - width + 1)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (portable) {
        var acc1 = 7L
        var acc2 = 11L
        var ok = true
        var j = i
        while (j < i + width && ok) {
          if (th.isNullAt(j)) ok = false
          else {
            val x = th.getLong(j)
            acc1 = (acc1 * 31L + x) % PolyP
            acc2 = (acc2 * 37L + x) % PolyBandP
          }
          j += 1
        }
        if (ok) out(i) = acc1 * PolyBandP + acc2
      } else {
        var acc = 42L
        var j = i
        while (j < i + width) {
          acc =
            if (th.isNullAt(j)) XXH64.hashLong(acc, 42L)
            else XXH64.hashLong(acc, XXH64.hashLong(th.getLong(j), 42L))
          j += 1
        }
        out(i) = acc
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Positions i < min(|a|, |b|) where both are non-null and equal — the
    * `size(filter(zip_with(a, b, (x,y) -> x = y), v -> v))` count (zip_with
    * pads with null, null = y is null, filter drops non-true). */
  def eqCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

private object HashExprChecks {
  def longArray(dt: DataType, who: String, side: String = "argument"): TypeCheckResult = dt match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$who expects an array<bigint> $side, got ${other.simpleString}")
  }
}

/** MinHash signature of a base-hash array; see [[HashKernels]] for the exact
  * per-family algebra. Reference anchor: the signature stage of
  * `Dedup.withMinHash` (MinHashLSH per Broder '97; the reference exposes
  * vector similarity, not MinHash — this is the LLM-pipeline extension). */
case class MinHashSignature(child: Expression, numHashes: Int, portable: Boolean)
    extends UnaryExpression {
  // Cap at 2147, not 4096: the retained SQL spec this kernel is asserted
  // bit-identical to computes (1 + h * 1000003) in 32-bit int arithmetic,
  // which overflows at h >= 2148 (wraps non-ANSI, raises under ANSI) while
  // the kernel uses longs — the bit-identity contract only holds below it.
  require(numHashes > 0 && numHashes <= 2147, s"numHashes=$numHashes out of (0, 2147]")

  override def prettyName: String = "graft_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprChecks.longArray(child.dataType, prettyName)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (portable) HashKernels.minHashPortable(arr, numHashes)
    else HashKernels.minHashXx(arr, numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (portable) "minHashPortable" else "minHashXx"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.$fn($c, $numHashes);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** SimHash fingerprint of a token-hash array (Charikar '02); 63 bits in the
  * portable family (bit 63 would need signed-overflow shifts DuckDB
  * rejects), 64 in the xxhash64 family. */
case class SimHash64(child: Expression, portable: Boolean) extends UnaryExpression {

  override def prettyName: String = "graft_simhash"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprChecks.longArray(child.dataType, prettyName)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (portable) HashKernels.simHashPortable(arr) else HashKernels.simHashXx(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (portable) "simHashPortable" else "simHashXx"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.HashKernels.$fn($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Random-hyperplane sign signature of a vector for one band index —
  * the per-(band, bit, dim) component is the same hash-uniform family the
  * SQL form used (LCG portable / xxhash64 default). */
case class PlaneSignature(
    left: Expression, right: Expression, bits: Int, seed: Long, portable: Boolean)
    extends BinaryExpression {
  require(bits > 0 && bits <= 63, s"bits=$bits out of (0, 63]")

  override def prettyName: String = "graft_plane_sig"
  override def dataType: DataType = LongType

  private def vecOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vecOk(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> vector, got ${left.dataType.simpleString}")
    else if (right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an int band index, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(vec: Any, band: Any): Any =
    HashKernels.planeSig(
      vec.asInstanceOf[ArrayData], isFloat, band.asInstanceOf[Int], bits, seed, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b) =>
      s"${ev.value} = graft.functions.HashKernels.planeSig(" +
        s"$v, $isFloat, $b, $bits, ${seed}L, $portable);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PlaneSignature =
    copy(left = newLeft, right = newRight)
}

/** Hash bag-of-words embedding of a token-value array — the
  * [[graft.vectors.HashEmbedder]] projection kernel. */
case class HashEmbed(child: Expression, dim: Int, seed: Long, portable: Boolean)
    extends UnaryExpression {
  require(dim > 0 && dim <= 4096, s"dim=$dim out of (0, 4096]")

  override def prettyName: String = "graft_hash_embed"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprChecks.longArray(child.dataType, prettyName)

  override def nullSafeEval(input: Any): Any =
    HashKernels.hashEmbed(input.asInstanceOf[ArrayData], dim, seed, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.hashEmbed($c, $dim, ${seed}L, $portable);")

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}

/** Rolling token-window hashes for exact substring dedup — see
  * [[HashKernels.windowHashes]] for the per-family fold. */
case class WindowHashes(child: Expression, width: Int, portable: Boolean)
    extends UnaryExpression {
  require(width > 0 && width <= 4096, s"width=$width out of (0, 4096]")

  override def prettyName: String = "graft_window_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprChecks.longArray(child.dataType, prettyName)

  override def nullSafeEval(input: Any): Any =
    HashKernels.windowHashes(input.asInstanceOf[ArrayData], width, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.windowHashes($c, $width, $portable);")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

/** Count of pairwise-equal positions of two bigint arrays (the MinHash
  * signature agreement count). */
case class ArrayEqCount(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "graft_eq_count"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = HashExprChecks.longArray(left.dataType, prettyName, "left argument")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else HashExprChecks.longArray(right.dataType, prettyName, "right argument")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.eqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashKernels.eqCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayEqCount =
    copy(left = newLeft, right = newRight)
}
