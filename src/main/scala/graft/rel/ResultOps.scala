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
   * the exact element. If a bracket stops shrinking (mass duplicates
   * around the median) the distinct-value cardinality inside the bracket
   * is by construction small, and a per-value count collect resolves the
   * rank exactly.
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
        // two-point bracket that cannot shrink: duplicates dominate, so the
        // distinct cardinality in the bracket is tiny — resolve by counts
        val counts = inBracket.groupBy("v").agg(count(lit(1)).as("c"))
          .orderBy("v").collect()
        var cum = below // rows strictly below the bracket precede it in rank
        val it = counts.iterator
        while (it.hasNext) {
          val r = it.next()
          cum += r.getLong(1)
          if (cum > target) return Some(r.getDouble(0))
        }
        return counts.lastOption.map(_.getDouble(0))
      }
      target -= below
      cur = inBracket
      curN = bn
    }
    // exact within the final bracket: collect the ≤ localBracket doubles
    // (≤ ~2 MB at the default) and rank driver-side — no sort exchange at
    // all, and no TakeOrdered fallback-to-global-sort above the top-K
    // threshold for large in-bracket ranks
    require(curN <= Int.MaxValue, s"median bracket failed to shrink: n=$curN")
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
