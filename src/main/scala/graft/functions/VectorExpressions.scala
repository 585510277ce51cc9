package graft.functions

import org.apache.spark.sql.{Column, GraftSqlInternals, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/**
 * Native (whole-stage-codegen) vector kernels.
 *
 * Why: Spark's higher-order functions (`zip_with`, `aggregate`, `transform`)
 * are CORRECT but run interpreted — each lambda is evaluated per element
 * through `HigherOrderFunction.eval`, they never enter whole-stage codegen,
 * and `zip_with` materializes an intermediate product array per row. On the
 * ANN hot paths (brute-force cosine over |Q|·|C| pairs, IVF/PQ re-rank,
 * near-dup verification) the cosine kernel IS the query, so this is the one
 * place the preference order "native Catalyst Expression over composed
 * built-ins" pays: [[CosineSimilarity]] fuses dot + both norms into ONE
 * tight generated loop over the two arrays — no intermediate array, no
 * per-element virtual calls, stays inside the surrounding codegen stage.
 *
 * Numerical contract — bit-identical to the SQL form it replaces
 * (`aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (s,v) -> s+v)
 *  / (sqrt(aggregate(a, …x*x…)) * sqrt(aggregate(b, …y*y…)))`):
 * the three accumulators are summed in index order with the same
 * float→double widening, so every oracle query that round-trips a cosine
 * through DuckDB keeps hashing identically (asserted per element type in
 * `VectorExpressionsSpec`). Divergences only on degenerate inputs, where
 * the expression is TOTAL instead of error-raising: length mismatch, a
 * null element, or a zero-norm side each yield NULL (the SQL form's
 * zip_with padding yields NULL for the first two; ANSI-mode division would
 * raise on the third).
 *
 * Reference anchor: cosine scoring in vector selection
 * (raphtory/src/vectors/vector_selection.rs, score-by-similarity) — the
 * reference computes cosine on the driver per candidate; here it is a
 * distributed scan kernel.
 */
object VectorExpressions {

  /** Cosine similarity of two `array<float|double>` columns as a native
    * codegen expression; NULL on length mismatch, null element, or
    * zero-norm side. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlInternals.column(
      CosineSimilarity(GraftSqlInternals.expression(a), GraftSqlInternals.expression(b)))

  def cosineSim(a: String, b: String): Column = cosineSim(col(a), col(b))

  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.{BooleanType, IntegerType => IntT, LongType => LongT}

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntT) => v
    case Literal(v: Long, LongT) => v.toInt
    case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
  }
  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntT) => v.toLong
    case Literal(v: Long, LongT) => v
    case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
  }
  private def litBool(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, BooleanType) => v
    case _ => throw new IllegalArgumentException(s"$what must be a boolean literal")
  }
  private def arity(children: Seq[Expression], n: Int, sig: String): Unit =
    require(children.size == n, s"$sig takes exactly $n arguments")

  /** Every native kernel as a SQL-registrable (name, info, builder) triple —
    * shared by [[register]] and [[GraftExtensions]]. Config arguments
    * (hash counts, seeds, family flags) must be literals: they are
    * constructor parameters of the expression, fixed at plan time. */
  private[functions] val sqlFunctions: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (c: Seq[Expression]) => {
        arity(c, 2, "graft_cosine(a, b)")
        CosineSimilarity(c.head, c(1))
      }),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (c: Seq[Expression]) => {
        arity(c, 3, "graft_minhash(baseHashes, numHashes, portable)")
        MinHashSignature(c.head, litInt(c(1), "numHashes"), litBool(c(2), "portable"))
      }),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (c: Seq[Expression]) => {
        arity(c, 2, "graft_simhash(tokenHashes, portable)")
        SimHash64(c.head, litBool(c(1), "portable"))
      }),
    (FunctionIdentifier("graft_plane_sig"),
      new ExpressionInfo(classOf[PlaneSignature].getName, "graft_plane_sig"),
      (c: Seq[Expression]) => {
        arity(c, 5, "graft_plane_sig(vec, band, bits, seed, portable)")
        PlaneSignature(c.head, c(1), litInt(c(2), "bits"), litLong(c(3), "seed"),
          litBool(c(4), "portable"))
      }),
    (FunctionIdentifier("graft_hash_embed"),
      new ExpressionInfo(classOf[HashEmbed].getName, "graft_hash_embed"),
      (c: Seq[Expression]) => {
        arity(c, 4, "graft_hash_embed(tokenValues, dim, seed, portable)")
        HashEmbed(c.head, litInt(c(1), "dim"), litLong(c(2), "seed"), litBool(c(3), "portable"))
      }),
    (FunctionIdentifier("graft_window_hashes"),
      new ExpressionInfo(classOf[WindowHashes].getName, "graft_window_hashes"),
      (c: Seq[Expression]) => {
        arity(c, 3, "graft_window_hashes(tokenHashes, width, portable)")
        WindowHashes(c.head, litInt(c(1), "width"), litBool(c(2), "portable"))
      }),
    (FunctionIdentifier("graft_eq_count"),
      new ExpressionInfo(classOf[ArrayEqCount].getName, "graft_eq_count"),
      (c: Seq[Expression]) => {
        arity(c, 2, "graft_eq_count(a, b)")
        ArrayEqCount(c.head, c(1))
      }))

  /** Register every native kernel (`graft_cosine`, `graft_minhash`,
    * `graft_simhash`, `graft_plane_sig`, `graft_hash_embed`,
    * `graft_eq_count`) in a session's function registry so they are
    * reachable from `spark.sql(...)` text too. */
  def register(spark: SparkSession): Unit =
    sqlFunctions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `SparkSessionExtensions` installer — enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`;
  * injects the native kernels into every session built from that
  * config (the spark-submit / cluster path, where calling
  * [[VectorExpressions.register]] by hand is awkward). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    VectorExpressions.sqlFunctions.foreach(ext.injectFunction)
}

/**
 * `cosine(a, b) = Σ aᵢbᵢ / (√Σ aᵢ² · √Σ bᵢ²)` over two numeric arrays,
 * fused into one loop. Accepts `array<float>` and `array<double>` on either
 * side independently (the testdata embeddings are float32; the in-plan
 * [[graft.vectors.Embedder]] emits float64).
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_cosine"
  override def dataType: DataType = DoubleType
  // NULL on degenerate inputs even when both children are non-null
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = aa.numElements()
    if (bb.numElements() != n) return null
    val (lf, rf) = (isFloat(left), isFloat(right))
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      val x = if (lf) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (rf) bb.getFloat(i).toDouble else bb.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val bad = ctx.freshName("bad")
      val den = ctx.freshName("den")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ($b.numElements() != $n);
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    final double $x = $getX;
         |    final double $y = $getY;
         |    $dot += $x * $y;
         |    $na += $x * $x;
         |    $nb += $y * $y;
         |  }
         |}
         |final double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($bad || $den == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / $den;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
