package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.TemporalGraph

/**
 * Bulk graph loaders mirroring the reference's loader contract:
 * `ColumnNames { time, secondary_index, src, dst, layer_col }` plus
 * property/metadata column lists and an optional constant layer
 * (raphtory/src/arrow_loader/df_loaders/edges.rs:58-66;
 * parquet loader raphtory/src/io/parquet_loaders.rs:108-199; CSV loader
 * io/csv_loader.rs; JSON loader io/json_loader.rs).
 *
 * Every loader normalizes to the engine's edge-events schema
 * `(src: long, dst: long, ts: long millis, event_id: long, layer: string,
 * <property columns...>)`. String/numeric ids become surrogate longs via
 * `xxhash64` (the GID→VID resolution of SURVEY §1.2); natural keys are kept
 * as `src_key`/`dst_key` columns for joins back to dimension data.
 */
object Loaders {

  /** Column-name mapping, the reference's `ColumnNames`. */
  final case class EdgeColumns(
      src: String,
      dst: String,
      time: String,
      secondaryIndex: Option[String] = None,
      layerCol: Option[String] = None,
      constantLayer: Option[String] = None,
      properties: Seq[String] = Nil)

  /** Normalize any DataFrame of edge events to the engine schema. */
  def edgesFromDataFrame(df: DataFrame, cols: EdgeColumns): DataFrame = {
    val ts = toEpochMillis(df, cols.time)
    val layer = (cols.layerCol, cols.constantLayer) match {
      case (Some(c), _) => df(c).cast("string")
      case (None, Some(l)) => lit(l)
      case _ => lit("_default")
    }
    val eventId = cols.secondaryIndex.map(df(_).cast("long")).getOrElse(lit(0L))
    val base = df.select(
      Seq(
        idOf(df, cols.src).as("src"),
        idOf(df, cols.dst).as("dst"),
        ts.as("ts"),
        eventId.as("event_id"),
        layer.as("layer"),
        df(cols.src).cast("string").as("src_key"),
        df(cols.dst).cast("string").as("dst_key")) ++
        cols.properties.map(p => df(p)): _*)
    base
  }

  /** Parquet edge load (reference io/parquet_loaders.rs:108). */
  def edgesFromParquet(spark: SparkSession, path: String, cols: EdgeColumns): TemporalGraph =
    TemporalGraph(edgesFromDataFrame(spark.read.parquet(path), cols))

  /** CSV edge load with header + type inference (reference io/csv_loader.rs
    * supports typed records, gz/bz2 — Spark's csv reader handles the
    * compression codecs transparently). */
  def edgesFromCsv(
      spark: SparkSession,
      path: String,
      cols: EdgeColumns,
      delimiter: String = ",",
      header: Boolean = true): TemporalGraph =
    TemporalGraph(
      edgesFromDataFrame(
        spark.read
          .option("header", header.toString)
          .option("sep", delimiter)
          .option("inferSchema", "true")
          .csv(path),
        cols))

  /** JSON-lines edge load (reference io/json_loader.rs). */
  def edgesFromJson(spark: SparkSession, path: String, cols: EdgeColumns): TemporalGraph =
    TemporalGraph(edgesFromDataFrame(spark.read.json(path), cols))

  /** Edge-deletions load (reference load_edge_deletions_from_parquet,
    * io/parquet_loaders.rs:298; edge metadata variant :252): the same
    * ColumnNames contract, normalized to the engine edge-event schema, for
    * the deletions side of [[graft.graph.PersistentGraph]]. */
  def deletionsFromDataFrame(df: DataFrame, cols: EdgeColumns): DataFrame =
    edgesFromDataFrame(df, cols)

  def deletionsFromParquet(spark: SparkSession, path: String, cols: EdgeColumns): DataFrame =
    deletionsFromDataFrame(spark.read.parquet(path), cols)

  /** Node dimension load (reference load_nodes_from_parquet,
    * io/parquet_loaders.rs:44): id, optional time + node type + props. */
  def nodesFromDataFrame(
      df: DataFrame,
      id: String,
      time: Option[String] = None,
      nodeType: Option[String] = None,
      properties: Seq[String] = Nil): DataFrame =
    df.select(
      Seq(
        idOf(df, id).as("id"),
        df(id).cast("string").as("id_key"),
        time.map(t => toEpochMillis(df, t)).getOrElse(lit(0L)).as("ts"),
        nodeType.map(df(_).cast("string")).getOrElse(lit(null).cast("string")).as("node_type")) ++
        properties.map(df(_)): _*)

  /** Surrogate id by declared type: numeric ids pass through exactly
    * (reference GID::U64), strings hash (GID::Str → xxhash64 surrogate).
    * Resolved statically from the schema — no per-row try-cast (ANSI-safe,
    * codegen-friendly). */
  private def idOf(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case _: org.apache.spark.sql.types.NumericType => df(name).cast("long")
      case _ => xxhash64(df(name).cast("string"))
    }

  /** Epoch millis by declared type: timestamps convert, numerics pass
    * through as millis. */
  private def toEpochMillis(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case _: org.apache.spark.sql.types.TimestampType => unix_millis(df(name))
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_millis(df(name).cast("timestamp_ltz"))
      case org.apache.spark.sql.types.DateType => unix_millis(df(name).cast("timestamp_ltz"))
      case _ => df(name).cast("long")
    }
}
