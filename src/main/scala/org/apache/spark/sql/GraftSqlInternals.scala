package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/**
 * Minimal bridge into `private[sql]` Spark internals.
 *
 * Why it exists: `Dataset.localCheckpoint(eager = true)` truncates the
 * *plan* but copies the optimizer's estimated statistics into the resulting
 * `LogicalRDD` (`originStats`). In an iterative driver loop whose superstep
 * joins the previous state more than once, the estimated `sizeInBytes`
 * (a BigInt) is *multiplied* at every join — so its bit-length doubles per
 * superstep and by ~20 supersteps the driver spends minutes inside
 * `BigInteger.multiply` during planning. Re-wrapping the materialized
 * internal RDD in a fresh `LogicalRDD` resets the stats to the bounded
 * default while keeping the zero-copy UnsafeRow data path (the public
 * `createDataFrame(RDD[Row], schema)` would force a per-row
 * InternalRow↔Row conversion on every downstream scan).
 */
object GraftSqlInternals {

  /** DataFrame over an already-materialized InternalRow RDD, with fresh
    * (default) statistics. */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
