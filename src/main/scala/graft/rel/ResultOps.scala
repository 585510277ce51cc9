package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /**
   * Exact median (reference median_item_by, node_state_ops.rs:206: element
   * at index n/2 — the upper middle for even n). Distributed rank-select:
   * per-value counts aggregate in parallel, then a cumulative sum over the
   * *distinct values* finds the first value whose cumulative count passes
   * the target rank. The only single-partition step is the window over
   * distinct values (cardinality « n; no Int overflow, no n/2-row limit).
   */
  def median(df: DataFrame, valueCol: String): Option[Double] = {
    val n = df.count()
    if (n == 0) return None
    val rank = n / 2 // 0-indexed upper-middle
    val counts = df.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cum", org.apache.spark.sql.functions.sum(col("c")).over(w))
      .filter(col("cum") > rank)
      .orderBy(col("v"))
      .limit(1)
      .collect()
      .headOption
      .map(_.getAs[Any]("v").toString.toDouble)
  }

  /** Group node states by a value column (reference group_by):
    * (value, node ids, count). */
  def groupBy(df: DataFrame, valueCol: String): DataFrame =
    df.groupBy(col(valueCol))
      .agg(sort_array(collect_list(col("id"))).as("ids"), count(lit(1)).as("n"))
}
