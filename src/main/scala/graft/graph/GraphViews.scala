package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative view-composition interpreter — the engine's analog of the
 * reference GraphQL layer's `apply_views`
 * (raphtory-graphql/src/model/graph/graph.rs:857-920: an ordered list of
 * one-of view operations folded over the running graph view) plus the
 * sorted/paged `nodes`/`edges` resolvers (model/graph/nodes.rs:335-455).
 *
 * This is the surface a remote caller (or a saved query) uses: a ViewSpec
 * is pure data (serializable, inspectable), and interpreting it just
 * narrows DataFrames — Catalyst still sees one composed plan, so filter
 * pushdown/pruning work across the whole chain exactly as if the user had
 * written the composition by hand. Nothing is materialized until a
 * resolver runs.
 *
 * Variant coverage vs `GraphViewCollection` (filtering.rs:54-95):
 * DefaultLayer/Layers/ExcludeLayers/ExcludeLayer → [[ViewOp.Layers]] /
 * [[ViewOp.ExcludeLayers]]; Subgraph/SubgraphNodeTypes/ExcludeNodes,
 * Window/At/Latest/SnapshotAt/SnapshotLatest/Before/After,
 * ShrinkWindow/ShrinkStart/ShrinkEnd, NodeFilter/EdgeFilter (the filter
 * algebra is [[graft.rel.Predicates]] — any composite Column predicate).
 * `Valid` is persistent-graph-only (deletion semantics live in
 * [[PersistentGraph]]).
 */
object GraphViews {

  sealed trait ViewOp
  object ViewOp {
    /** Keep only the default layer (reference DefaultLayer(true)). */
    case object DefaultLayer extends ViewOp
    final case class Layers(names: Seq[String]) extends ViewOp
    final case class ExcludeLayers(names: Seq[String]) extends ViewOp
    final case class Subgraph(nodeIds: Seq[Long]) extends ViewOp
    final case class SubgraphNodeTypes(types: Seq[String]) extends ViewOp
    final case class ExcludeNodes(nodeIds: Seq[Long]) extends ViewOp
    final case class Window(startMs: Long, endMs: Long) extends ViewOp
    final case class At(t: Long) extends ViewOp
    case object Latest extends ViewOp
    final case class SnapshotAt(t: Long) extends ViewOp
    case object SnapshotLatest extends ViewOp
    final case class Before(t: Long) extends ViewOp
    final case class After(t: Long) extends ViewOp
    final case class ShrinkWindow(startMs: Long, endMs: Long) extends ViewOp
    final case class ShrinkStart(startMs: Long) extends ViewOp
    final case class ShrinkEnd(endMs: Long) extends ViewOp
    /** Composite node predicate over the node-property table; edges
      * survive iff BOTH endpoints survive (node_filtered_graph). */
    final case class NodeFilter(pred: Column) extends ViewOp
    /** Randomized reference model over the view's edge list
      * ([[NullModels]]): kind ∈ permute_ts | permute_ts_within_layer |
      * configuration. Composes like any other op — e.g. window first,
      * then permute within the window. The edge frame's `event_id` must
      * be unique (every loader/EdgeBuilder output is; ties would make
      * the permutation mapping arbitrary — see [[NullModels]]). */
    final case class NullModel(kind: String, seed: Long = 42L) extends ViewOp
    /** Composite predicate over the temporal edge rows. */
    final case class EdgeFilter(pred: Column) extends ViewOp
  }

  /** Fold an ordered op chain over a property graph (the reference's
    * `apply_views` loop). Node-dimension ops narrow the node table too, so
    * later node ops compose (the GqlGraph carries its node set the same
    * way). */
  def applyViews(pg: PropertyGraph, ops: Seq[ViewOp]): PropertyGraph =
    ops.foldLeft(pg)(applyOne)

  /** Graph-only convenience when no node dimension is involved. */
  def applyViews(g: TemporalGraph, ops: Seq[ViewOp]): TemporalGraph = {
    require(
      !ops.exists(_.isInstanceOf[ViewOp.SubgraphNodeTypes]) &&
        !ops.exists(_.isInstanceOf[ViewOp.NodeFilter]),
      "SubgraphNodeTypes/NodeFilter need a PropertyGraph (node dimension)")
    applyViews(PropertyGraph(g, emptyNodes(g)), ops).graph
  }

  private def emptyNodes(g: TemporalGraph): DataFrame =
    g.edges.sparkSession
      .range(0)
      .select(
        col("id"),
        lit(0L).as("ts"),
        lit(null).cast("string").as("node_type"))

  private def applyOne(pg: PropertyGraph, op: ViewOp): PropertyGraph = {
    import ViewOp._
    val g = pg.graph
    def withGraph(g2: TemporalGraph): PropertyGraph = pg.copy(graph = g2)
    def narrowNodes(g2: TemporalGraph, ids: DataFrame): PropertyGraph =
      PropertyGraph(g2, pg.nodes.join(ids, Seq("id"), "left_semi"))
    op match {
      case DefaultLayer        => withGraph(g.layer("_default"))
      case Layers(names)       => withGraph(g.layer(names: _*))
      case ExcludeLayers(n)    => withGraph(g.filter(!col("layer").isin(n: _*)))
      case Window(s, e)        => withGraph(g.window(s, e))
      case At(t)               => withGraph(g.at(t))
      case Latest              => withGraph(g.latest())
      case SnapshotAt(t)       => withGraph(g.snapshotAt(t))
      case SnapshotLatest      => withGraph(g.snapshotLatest())
      case Before(t)           => withGraph(g.before(t))
      case After(t)            => withGraph(g.after(t))
      case ShrinkWindow(s, e)  => withGraph(g.shrinkWindow(s, e))
      case ShrinkStart(s)      => withGraph(g.shrinkStart(s))
      case ShrinkEnd(e)        => withGraph(g.shrinkEnd(e))
      case EdgeFilter(pred)    => withGraph(g.filter(pred))
      case Subgraph(ids) =>
        val idDf = toIdDf(g, ids)
        narrowNodes(g.subgraph(idDf), idDf)
      case ExcludeNodes(ids) =>
        val idDf = toIdDf(g, ids)
        PropertyGraph(
          g.excludeNodes(idDf),
          pg.nodes.join(idDf, Seq("id"), "left_anti"))
      case SubgraphNodeTypes(types) => pg.subgraphNodeTypes(types: _*)
      case NodeFilter(pred) =>
        val ids = pg.nodes.filter(pred).select("id").distinct()
        narrowNodes(g.subgraph(ids), ids)
      case NullModel(kind, seed) =>
        val e2 = kind match {
          case "permute_ts" => NullModels.permutedTimestamps(g.edges, seed)
          case "permute_ts_within_layer" =>
            NullModels.shuffleColumnWithin(g.edges, "ts", Seq("layer"), "event_id", seed)
          case "configuration" => NullModels.configurationModel(g.edges, seed)
          case other => throw new IllegalArgumentException(
            s"unknown null model '$other' (permute_ts | permute_ts_within_layer | configuration)")
        }
        withGraph(TemporalGraph(e2))
    }
  }

  private def toIdDf(g: TemporalGraph, ids: Seq[Long]): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    ids.toDF("id")
  }

  // ---- sorted / paged resolvers (nodes.rs:335-455 Sorted/Page/List) ----

  final case class SortKey(column: String, desc: Boolean = false)

  private def orderCols(sort: Seq[SortKey]): Seq[Column] =
    sort.map(k => if (k.desc) col(k.column).desc else col(k.column).asc)

  /**
   * Node rows of the view — `(id, out_deg, in_deg, deg)` plus `node_type`
   * when the node dimension carries one — sorted by `sort` (ties broken by
   * id so pages are deterministic) and paged. `limit` ≤ 0 means the full
   * list (the `list` resolver). Pagination composes into the plan
   * (`offset`/`limit` are logical operators, pushed to a single
   * TakeOrdered at execution).
   */
  def nodesPage(
      pg: PropertyGraph,
      sort: Seq[SortKey] = Seq(SortKey("id")),
      offset: Int = 0,
      limit: Int = -1): DataFrame = {
    val base = pg.graph.degrees
    val withType =
      if (pg.nodes.columns.contains("node_type"))
        base.join(pg.nodes.select("id", "node_type").distinct(), Seq("id"), "left")
      else base
    page(withType.orderBy(orderCols(sort) :+ col("id").asc: _*), offset, limit)
  }

  /** Temporal edge rows of the view, sorted + paged (edges resolver). */
  def edgesPage(
      g: TemporalGraph,
      sort: Seq[SortKey] = Seq(SortKey("src"), SortKey("dst")),
      offset: Int = 0,
      limit: Int = -1): DataFrame =
    page(
      g.edges.orderBy(
        orderCols(sort) ++ Seq(col("src"), col("dst"), col("ts"), col("event_id")): _*),
      offset,
      limit)

  /** Sort + page an algorithm result frame (`id` tie-break keeps pages
    * deterministic — every graft.algos result carries an `id` column). */
  def resultPage(
      df: DataFrame,
      sort: Seq[SortKey],
      offset: Int = 0,
      limit: Int = -1): DataFrame = {
    // id tiebreaker only where an id exists — global scalar results
    // (e.g. triangle_count) have no per-node key
    val order =
      if (df.columns.contains("id")) orderCols(sort) :+ col("id").asc
      else orderCols(sort)
    page(df.orderBy(order: _*), offset, limit)
  }

  private def page(df: DataFrame, offset: Int, limit: Int): DataFrame = {
    val off = if (offset > 0) df.offset(offset) else df
    if (limit >= 0) off.limit(limit) else off
  }
}
