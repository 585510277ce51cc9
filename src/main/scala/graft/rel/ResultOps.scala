package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Result-side operations over per-node algorithm outputs — the Spark
 * counterpart of the reference's `NodeStateOps`
 * (raphtory/src/db/api/state/node_state_ops.rs): group_by, sum/mean/median,
 * min/max_item_by, top_k/bottom_k, sort_by, sort_by_id.
 *
 * All operate on a DataFrame with an `id` column plus value columns.
 */
object ResultOps {

  def sortById(df: DataFrame): DataFrame = df.orderBy("id")

  def sortBy(df: DataFrame, valueCol: String, ascending: Boolean = true): DataFrame =
    if (ascending) df.orderBy(col(valueCol), col("id"))
    else df.orderBy(col(valueCol).desc, col("id"))

  def topK(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.orderBy(col(valueCol).desc, col("id")).limit(k)

  def bottomK(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.orderBy(col(valueCol), col("id")).limit(k)

  /** Node with the maximal value (reference max_item_by). */
  def maxItem(df: DataFrame, valueCol: String): Option[(Long, Double)] =
    topK(df, valueCol, 1).collect().headOption.map(r =>
      (r.getAs[Long]("id"), r.getAs[Any](valueCol).toString.toDouble))

  def minItem(df: DataFrame, valueCol: String): Option[(Long, Double)] =
    bottomK(df, valueCol, 1).collect().headOption.map(r =>
      (r.getAs[Long]("id"), r.getAs[Any](valueCol).toString.toDouble))

  def sum(df: DataFrame, valueCol: String): Double =
    Option(df.agg(org.apache.spark.sql.functions.sum(col(valueCol))).first().get(0))
      .map(_.toString.toDouble).getOrElse(0.0)

  def mean(df: DataFrame, valueCol: String): Double =
    Option(df.agg(avg(col(valueCol))).first().get(0))
      .map(_.toString.toDouble).getOrElse(0.0)

  /** Bracket size below which the exact rank is resolved by collecting the
    * bracket's doubles and ranking driver-side. 2^18 doubles ≈ 2 MB. */
  private val MedianLocalBracket: Long = 1L << 18

  /**
   * Exact median (reference median_item_by, node_state_ops.rs:206: element
   * at index n/2 — the upper middle for even n; nulls excluded).
   *
   * Iterative bracket rank-select, safe for CONTINUOUS values (the r3
   * version's cumulative window over distinct values degenerated to a
   * single-partition sort of n rows when every value was distinct — e.g.
   * PageRank scores): each round brackets the target rank with
   * `approxQuantile` at ±1% rank margin (rank error ≤ 0.1%, so the true
   * rank-k value provably lies inside), counts the rows below, and
   * recurses into the ~2% bracket — O(log n) full passes, no sort. Once
   * the bracket fits [[MedianLocalBracket]], a TakeOrdered top-k resolves
   * the exact element. If a bracket stops shrinking (mass duplicates at
   * the bracket boundaries), the boundary values' own counts either
   * resolve the rank outright or the target falls in the STRICT interior,
   * which by the quantile construction holds ≤ ~2% of the rows — so every
   * round shrinks ~50× on both paths and nothing unbounded is ever
   * collected.
   */
  def median(
      df: DataFrame,
      valueCol: String,
      localBracket: Long = MedianLocalBracket): Option[Double] = {
    var cur = df.select(col(valueCol).cast("double").as("v")).filter(col("v").isNotNull)
    var curN = cur.count()
    if (curN == 0) return None
    var target = curN / 2 // 0-indexed upper-middle rank within `cur`
    var rounds = 0
    // each round shrinks the bracket ~50× (±1% rank margin), so 12 rounds
    // cover any Long-sized input; the guard exists for loop safety only
    while (curN > localBracket && rounds < 12) {
      rounds += 1
      val frac = (target.toDouble + 0.5) / curN
      val eps = 0.01
      val qs = cur.stat.approxQuantile(
        "v", Array(math.max(0.0, frac - eps), math.min(1.0, frac + eps)), 1e-3)
      val (vlo, vhi) = (qs(0), qs(1))
      if (vlo == vhi) return Some(vlo) // every rank in the margin holds this value
      val below = cur.filter(col("v") < vlo).count()
      val inBracket = cur.filter(col("v") >= vlo && col("v") <= vhi)
      val bn = inBracket.count()
      if (bn >= curN) {
        // bracket covers everything ⇒ the two boundary values are point
        // masses holding ranks ~(frac±1%)·n and beyond (all rows below the
        // lo-quantile rank must equal vlo, symmetrically vhi), so the
        // STRICT interior holds ≤ ~2%·n rows. Resolve at a boundary when
        // the target rank lands on its mass; otherwise recurse into the
        // interior — still a ~50× shrink, with no unbounded collect.
        val cLo = cur.filter(col("v") === vlo).count()
        if (target < below + cLo) return Some(vlo)
        val interior = cur.filter(col("v") > vlo && col("v") < vhi)
        val cMid = interior.count()
        if (target >= below + cLo + cMid) return Some(vhi)
        target -= below + cLo
        cur = interior
        curN = cMid
      } else {
        target -= below
        cur = inBracket
        curN = bn
      }
    }
    // exact within the final bracket: collect the ≤ localBracket doubles
    // (≤ ~2 MB at the default) and rank driver-side — no sort exchange at
    // all, and no TakeOrdered fallback-to-global-sort above the top-K
    // threshold for large in-bracket ranks
    // tripwire, not a path: both loop branches shrink ~50×/round, so 12
    // rounds reduce any input below localBracket; 16× slack keeps the
    // worst accepted collect ≈ 32 MB instead of silently OOMing the driver
    require(
      curN <= localBracket * 16,
      s"median bracket failed to shrink: n=$curN after $rounds rounds")
    val arr = cur.collect().map(_.getDouble(0))
    if (arr.isEmpty) None
    else {
      java.util.Arrays.sort(arr)
      Some(arr(target.toInt))
    }
  }

  /** Group node states by a value column (reference group_by):
    * (value, node ids, count). */
  def groupBy(df: DataFrame, valueCol: String): DataFrame =
    df.groupBy(col(valueCol))
      .agg(sort_array(collect_list(col("id"))).as("ids"), count(lit(1)).as("n"))
}
