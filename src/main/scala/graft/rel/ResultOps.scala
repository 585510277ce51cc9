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

  /** Exact median via sort (reference median_item_by is exact). */
  def median(df: DataFrame, valueCol: String): Option[Double] = {
    val n = df.count()
    if (n == 0) return None
    val idx = (n - 1) / 2
    df.orderBy(col(valueCol), col("id"))
      .limit((idx + 1).toInt)
      .orderBy(col(valueCol).desc, col("id").desc)
      .limit(1)
      .collect()
      .headOption
      .map(_.getAs[Any](valueCol).toString.toDouble)
  }

  /** Group node states by a value column (reference group_by):
    * (value, node ids, count). */
  def groupBy(df: DataFrame, valueCol: String): DataFrame =
    df.groupBy(col(valueCol))
      .agg(sort_array(collect_list(col("id"))).as("ids"), count(lit(1)).as("n"))
}
