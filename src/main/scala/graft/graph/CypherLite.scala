package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Cypher-lite: a MATCH-chain frontend covering the linear-pattern shapes
 * the reference's experimental Cypher layer exercises in its transpiler
 * tests (raphtory-cypher/src/transpiler/mod.rs:1216-1400, parser grammar in
 * parser/ast.rs — `MATCH ()-[e:LAYER]->() WHERE … RETURN … ORDER BY …
 * LIMIT n`), translated straight onto the same Catalyst edge frames the
 * view layer uses — Spark subsumes the reference's DataFusion execution
 * pipeline (SURVEY §3.3), so the translator is a parser + plan builder,
 * not an engine.
 *
 * Supported (the reference's test surface, not full openCypher):
 *  - MULTI-pattern MATCH: comma-separated linear patterns
 *    `(a)-[e:LAYER]->(b)<-[f]-(c), (b)-[g]->(d)` — named/anonymous nodes
 *    and edges, per-hop direction `->` / `<-` / undirected `-`
 *    (undirected matches both orientations, two bindings per edge, as in
 *    Cypher). Patterns sharing a node variable equi-join on it; disjoint
 *    patterns cross-join (the reference transpiler's `parse_tables_2`
 *    semantics, raphtory-cypher/src/transpiler/mod.rs:564-807). Edge
 *    variables must be unique across the whole MATCH. Relationship
 *    uniqueness is enforced: two edge variables never bind the same edge
 *    (the reference's unique_edge_filter, mod.rs:697-705, applied
 *    MATCH-wide as in openCypher; statically-distinct-layer pairs elided);
 *  - pattern property maps `(a {id: 5})` / `-[e {layer: 'x', time: 9}]->`
 *    desugared to equality conjuncts (ast.rs NodePattern/RelPattern.props,
 *    transpiler mod.rs:875-917); node LABELS `(a:User)` desugar to
 *    `a.node_type = 'User'` against the node-property frame (named
 *    variable + a props frame with node_type required); inside an
 *    OPTIONAL MATCH a label filters the clause's candidate matches,
 *    never the base rows;
 *  - variable-length hops `-[:L*a..b]->` (BEYOND the reference's
 *    frontend): expanded into a union of fixed-length chains with fresh
 *    anonymous intermediates, relationship uniqueness making each path's
 *    edges distinct (openCypher semantics); min ≥ 1, explicit upper bound
 *    required, branch product bounded; the hop variable cannot be named;
 *  - `WHERE` with and/or/not, parentheses, comparisons
 *    (=, <>, >, >=, <, <=), `CONTAINS`, `STARTS WITH`, `ENDS WITH`,
 *    `IN [literals]`, `IS [NOT] NULL` (the OPTIONAL MATCH null probe)
 *    over `var.field` / node vars / literals; value ARITHMETIC
 *    (+ − * / %, unary minus, standard precedence) anywhere a value
 *    appears — items, WHERE, ORDER BY — with arithmetic RETURN/WITH
 *    items requiring an `AS` alias (value-level parens unsupported:
 *    a leading paren always opens a boolean group); scalar functions
 *    `coalesce(…)`, `abs(x)`, `sign(x)`, `toLower(s)`, `toUpper(s)`,
 *    `size(s)` (string length), `toInteger(x)`, `toString(x)`, `trim(s)`
 *    anywhere a value appears; generic-form
 *    `CASE WHEN cond THEN val … [ELSE val] END` anywhere a value appears
 *    (branches in order, missing ELSE = null; the simple `CASE x WHEN`
 *    form is not supported);
 *  - `OPTIONAL MATCH` clauses (BEYOND the reference's frontend; openCypher
 *    semantics): each left-joins on its node variables shared with
 *    preceding clauses — a base row with no consistent match keeps the
 *    clause's new columns null; an OPTIONAL MATCH's own `WHERE` filters
 *    its candidate matches (never the base rows) and may reference only
 *    the clause's variables; relationship uniqueness is scoped per clause;
 *    at least one shared node variable is required;
 *  - `WITH` pipeline stages (BEYOND the reference's frontend; openCypher
 *    semantics): `MATCH … WITH [DISTINCT] items [WHERE …] [ORDER BY …
 *    [SKIP s] LIMIT n] MATCH … RETURN …` — `WITH *` (or `WITH *, items`)
 *    carries
 *    the whole named scope; items rebind the scope (bare/aliased
 *    node and edge variables carry through; expressions and aggregates
 *    must be aliased and become scalar columns; everything not listed
 *    goes out of scope), an aggregate item triggers implicit grouping by
 *    the non-aggregate items, the WHERE filters the PROJECTED rows (the
 *    HAVING shape, written right after the items), and ORDER BY+LIMIT is
 *    a mid-pipeline top-k (ORDER BY without LIMIT is refused as a no-op).
 *    A later MATCH equi-joins on carried node variables (cross join when
 *    disjoint) and its WHERE may reference carried columns;
 *  - `RETURN [DISTINCT] *` | items (`e`, `n`, `e.field`, `type(e)`,
 *    WITH-projected scalars by name, aggregates `COUNT(*)` / `COUNT(e)`
 *    / `COUNT(e.f)` / `SUM` / `MIN` / `MAX` / `AVG` / `COLLECT` —
 *    DISTINCT honoured for count/sum/collect, a no-op for min/max,
 *    refused for avg; collect() pins ASCENDING element order for
 *    determinism) with `AS` aliases; mixing aggregates with plain items
 *    applies Cypher's IMPLICIT GROUPING — the non-aggregate items become
 *    the grouping keys (transpiler/mod.rs:372-437); `RETURN DISTINCT`
 *    dedups the projected rows (refused alongside aggregates, and its
 *    ORDER BY must name a RETURN item); `ORDER BY … [ASC|DESC]` (over
 *    output items when grouped); `SKIP s` (openCypher pagination —
 *    requires ORDER BY so pages are well-defined); `LIMIT n`;
 *  - `UNION [ALL]` between whole queries (openCypher set semantics:
 *    UNION dedups the combined rows, ALL keeps them; parts must return
 *    the same columns and the two forms cannot mix);
 *  - `UNWIND list AS x` (openCypher row generation): one output row per
 *    list element, bound as a scalar. The list is a literal `[…]` or a
 *    carried scalar (a `collect(…)` alias from a preceding WITH — the
 *    collect→UNWIND round trip). UNWIND clauses stack (later ones may
 *    reference earlier aliases; cross-product semantics) and may open a
 *    query, follow a WITH, or precede a MATCH whose WHERE references the
 *    unwound value. An empty or null list yields no rows (openCypher);
 *  - `[NOT] EXISTS { [MATCH] pattern[, …] [WHERE …] }` pattern predicates
 *    as top-level AND conjuncts of a required-MATCH WHERE: each compiles
 *    to a LEFT SEMI (ANTI) join on the node variables shared with the
 *    outer MATCH (at least one required; no row duplication). The inner
 *    WHERE is scoped to the subpattern's variables (shared nodes
 *    included); relationship uniqueness is clause-scoped, so subquery
 *    edges may coincide with outer ones (openCypher); labels inside
 *    EXISTS are not supported. The openCypher-9 pattern-predicate sugar
 *    `WHERE (b)-[:L]->(c)` / `WHERE NOT (b)-[:L]->(c)` desugars to the
 *    same EXISTS machinery.
 *
 * Field names: edges expose src, dst, ts (alias `time`), event_id, layer
 * (`type(e)` ≡ `e.layer`); a node variable IS its id. Returned edge
 * variables expand to `<var>_src, <var>_dst, <var>_ts, <var>_event_id,
 * <var>_layer`; `e.field` returns column `<var>_<field>`.
 *
 * NODE PROPERTIES: the `run(g, query, nodeProps)` overload accepts a
 * property table `(id, field, …)`; `a.field` on a node variable then
 * left-joins it on the node id (missing nodes read null — openCypher's
 * missing-property semantics). Available in required-MATCH WHERE, WITH
 * items and RETURN/ORDER BY; to use a property after a WITH, carry it as
 * an aliased item (or re-reach it through the carried node variable).
 */
object CypherLite {

  // ---------- AST ----------

  private final case class NodePat(
      name: Option[String],
      props: Seq[(String, Lit)] = Nil,
      label: Option[String] = None)
  /** dir: 1 = `->`, -1 = `<-`, 0 = undirected; range: variable-length
    * `*a..b` hop bounds (min ≥ 1, explicit upper bound required). */
  private final case class RelPat(
      name: Option[String],
      layer: Option[String],
      dir: Int,
      props: Seq[(String, Lit)] = Nil,
      range: Option[(Int, Int)] = None)

  /** Variable-length hops expand into a union of fixed-length chains —
    * branch count (product of per-hop choices across the MATCH) and hop
    * count are bounded so a typo cannot demand an unbounded plan. */
  private val MaxVarLenHops = 8
  private val MaxVarLenBranches = 64

  private sealed trait Expr
  private final case class Prop(v: String, field: String) extends Expr
  private final case class VarRef(name: String) extends Expr
  private final case class Lit(value: Any) extends Expr
  private final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  private final case class Not(e: Expr) extends Expr
  private final case class InList(e: Expr, items: Seq[Any]) extends Expr
  private final case class IsNull(e: Expr, negated: Boolean) extends Expr
  private final case class TypeOf(v: String) extends Expr
  /** Generic-form CASE: `CASE WHEN cond THEN val … [ELSE val] END` —
    * branches evaluate in order; no ELSE yields null (openCypher). */
  private final case class CaseWhen(
      branches: Seq[(Expr, Expr)],
      otherwise: Option[Expr]) extends Expr
  /** `EXISTS { [MATCH] patterns [WHERE …] }` — an existential pattern
    * predicate. Only valid as a top-level AND conjunct of a required-MATCH
    * WHERE (it compiles to a semi/anti JOIN, not a Column). */
  private final case class ExistsPat(
      patterns: Seq[Pattern],
      where: Option[Expr]) extends Expr
  /** Scalar function call — the supported set is [[ScalarFns]]. */
  private final case class ScalarFn(fn: String, args: Seq[Expr]) extends Expr
  /** Aggregate call: fn ∈ count/sum/min/max/avg. `COUNT(*)` has no arg;
    * DISTINCT is honoured for count/sum (a no-op for min/max, refused for
    * avg). */
  private final case class AggFn(fn: String, arg: Option[Expr], distinct: Boolean) extends Expr

  private final case class RetItem(expr: Expr, alias: Option[String])
  private final case class Pattern(nodes: Seq[NodePat], rels: Seq[RelPat])

  /** `UNWIND list AS alias` — list is a literal element sequence or an
    * expression over the current scope (a carried collect() alias). */
  private final case class Unwind(list: Either[Seq[Any], Expr], alias: String)

  /** One MATCH segment: leading UNWIND clauses + required patterns +
    * clause WHERE + its OPTIONAL MATCH clauses. A query is a pipeline of
    * segments separated by WITH. A segment may be UNWIND-only (no
    * patterns) — `UNWIND … RETURN …`. */
  private final case class Segment(
      unwinds: Seq[Unwind],
      patterns: Seq[Pattern],
      where: Option[Expr],
      optionals: Seq[(Seq[Pattern], Option[Expr])])

  /** WITH projection between segments (openCypher): items rebind the
    * visible variables (everything not carried goes out of scope), an
    * aggregate item triggers implicit grouping by the non-aggregate items,
    * the WHERE filters the PROJECTED rows (the HAVING shape), and
    * ORDER BY + LIMIT make a mid-pipeline top-k. */
  private final case class WithClause(
      distinct: Boolean,
      star: Boolean, // `WITH *` / `WITH *, items` — carry the whole scope
      items: Seq[RetItem],
      where: Option[Expr],
      orderBy: Seq[(Expr, Boolean)],
      skip: Option[Int],
      limit: Option[Int])

  private final case class Ast(
      segments: Seq[(Segment, WithClause)], // each ends in its WITH
      last: Segment, // the segment RETURN projects from
      returnStar: Boolean,
      distinct: Boolean, // RETURN DISTINCT — dedup the projected rows
      items: Seq[RetItem],
      orderBy: Seq[(Expr, Boolean)], // (expr, descending)
      skip: Option[Int], // SKIP n — openCypher pagination, needs ORDER BY
      limit: Option[Int])

  // ---------- tokenizer ----------

  private final case class Tok(kind: String, text: String)

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    def peek(k: Int = 0): Char = if (i + k < s.length) s.charAt(i + k) else '\u0000'
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val j = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        out += Tok("ident", s.substring(j, i))
      } else if (c.isDigit) {
        // a '.' continues the number ONLY when a digit follows — `1..3`
        // (variable-length range) lexes as num(1) '.' '.' num(3)
        val j = i
        while (i < s.length &&
          (s.charAt(i).isDigit || (s.charAt(i) == '.' && peek(1).isDigit))) i += 1
        out += Tok("num", s.substring(j, i))
      } else if (c == '\'' || c == '"') {
        val q = c; val j = i + 1; i += 1
        while (i < s.length && s.charAt(i) != q) i += 1
        require(i < s.length, s"unterminated string at offset $j")
        out += Tok("str", s.substring(j, i)); i += 1
      } else if (c == '<' && peek(1) == '>') { out += Tok("op", "<>"); i += 2 }
      else if (c == '<' && peek(1) == '=') { out += Tok("op", "<="); i += 2 }
      else if (c == '>' && peek(1) == '=') { out += Tok("op", ">="); i += 2 }
      else if (c == '<' && peek(1) == '-') { out += Tok("arrow", "<-"); i += 2 }
      else if (c == '-' && peek(1) == '>') { out += Tok("arrow", "->"); i += 2 }
      else if ("()[]{}.,:*=<>-+/%".contains(c)) { out += Tok(c.toString, c.toString); i += 1 }
      else throw new IllegalArgumentException(s"unexpected character '$c' at offset $i in: $s")
    }
    out.result()
  }

  // ---------- parser (recursive descent over the token vector) ----------

  private final class P(toks: Vector[Tok], q: String) {
    private var i = 0
    def peek: Tok = if (i < toks.length) toks(i) else Tok("eof", "")
    def peekAhead(k: Int): Tok = if (i + k < toks.length) toks(i + k) else Tok("eof", "")
    def next(): Tok = { val t = peek; i += 1; t }
    def kw(word: String): Boolean =
      peek.kind == "ident" && peek.text.equalsIgnoreCase(word)
    def eatKw(word: String): Unit = {
      require(kw(word), s"expected $word at '${peek.text}' in: $q")
      i += 1
    }
    def eat(kind: String): Tok = {
      require(peek.kind == kind, s"expected $kind at '${peek.text}' in: $q")
      next()
    }
    def done: Boolean = peek.kind == "eof"

    def parse(): Ast = {
      val segs = Seq.newBuilder[(Segment, WithClause)]
      var last: Segment = segment()
      while (kw("WITH")) {
        next()
        val distinct = if (kw("DISTINCT")) { next(); true } else false
        val b = Seq.newBuilder[RetItem]
        var star = false
        if (peek.kind == "*") { next(); star = true }
        else b += retItem()
        while (peek.kind == ",") { next(); b += retItem() }
        // WHERE right after the items (the HAVING shape) — filters the
        // projected rows BEFORE any ORDER BY/LIMIT top-k
        val w = if (kw("WHERE")) { next(); Some(boolExpr()) } else None
        val ord = orderByOpt()
        val skp = if (kw("SKIP")) { next(); Some(eat("num").text.toInt) } else None
        val lim = if (kw("LIMIT")) { next(); Some(eat("num").text.toInt) } else None
        segs += ((last, WithClause(distinct, star, b.result(), w, ord, skp, lim)))
        // a WITH may feed another WITH or RETURN directly (pure projection
        // stage) — the segment is empty then
        last =
          if (kw("MATCH") || kw("UNWIND")) segment()
          else Segment(Nil, Nil, None, Nil)
      }
      eatKw("RETURN")
      val distinct = if (kw("DISTINCT")) { next(); true } else false
      var star = false
      var items = Seq.empty[RetItem]
      if (peek.kind == "*") { next(); star = true }
      else {
        val b = Seq.newBuilder[RetItem]
        b += retItem()
        while (peek.kind == ",") { next(); b += retItem() }
        items = b.result()
      }
      val ord = orderByOpt()
      val skp = if (kw("SKIP")) { next(); Some(eat("num").text.toInt) } else None
      val lim = if (kw("LIMIT")) { next(); Some(eat("num").text.toInt) } else None
      Ast(segs.result(), last, star, distinct, items, ord, skp, lim)
    }

    /** Whole input: one query, or `UNION [ALL]`-combined queries
      * (openCypher set semantics: UNION dedups the combined rows, ALL
      * keeps them; mixing the two is refused at the run layer).
      * @return (ast, combinedWithAll) — the flag on the first part is
      *         meaningless */
    def parseAll(): Seq[(Ast, Boolean)] = {
      val out = Seq.newBuilder[(Ast, Boolean)]
      out += ((parse(), false))
      while (kw("UNION")) {
        next()
        val all = if (kw("ALL")) { next(); true } else false
        out += ((parse(), all))
      }
      require(done, s"trailing tokens from '${peek.text}' in: $q")
      out.result()
    }

    private def segment(): Segment = {
      // leading UNWIND clauses: `UNWIND [lits] AS x` or `UNWIND expr AS x`
      val unw = Seq.newBuilder[Unwind]
      while (kw("UNWIND")) {
        next()
        val lst: Either[Seq[Any], Expr] =
          if (peek.kind == "[") {
            next()
            val items = Seq.newBuilder[Any]
            if (peek.kind != "]") {
              items += litValue()
              while (peek.kind == ",") { next(); items += litValue() }
            }
            eat("]")
            Left(items.result())
          } else Right(valueExpr())
        eatKw("AS")
        unw += Unwind(lst, eat("ident").text)
      }
      val unwinds = unw.result()
      // an UNWIND-only segment feeds WITH/RETURN directly (no patterns)
      if (unwinds.nonEmpty && !kw("MATCH")) return Segment(unwinds, Nil, None, Nil)
      eatKw("MATCH")
      val pats = Seq.newBuilder[Pattern]
      pats += pattern()
      while (peek.kind == ",") { next(); pats += pattern() }
      val where = if (kw("WHERE")) { next(); Some(boolExpr()) } else None
      // OPTIONAL MATCH clauses (openCypher): each left-joins on its shared
      // node variables and carries its OWN WHERE (scoped to the optional
      // match — it filters candidate matches, never drops base rows)
      val opts = Seq.newBuilder[(Seq[Pattern], Option[Expr])]
      while (kw("OPTIONAL")) {
        next(); eatKw("MATCH")
        val ps = Seq.newBuilder[Pattern]
        ps += pattern()
        while (peek.kind == ",") { next(); ps += pattern() }
        val w = if (kw("WHERE")) { next(); Some(boolExpr()) } else None
        opts += ((ps.result(), w))
      }
      Segment(unwinds, pats.result(), where, opts.result())
    }

    private def orderByOpt(): Seq[(Expr, Boolean)] =
      if (!kw("ORDER")) Seq.empty
      else {
        next(); eatKw("BY")
        val b = Seq.newBuilder[(Expr, Boolean)]
        def key(): Unit = {
          val e = valueExpr()
          val desc =
            if (kw("DESC")) { next(); true }
            else if (kw("ASC")) { next(); false }
            else false
          b += ((e, desc))
        }
        key()
        while (peek.kind == ",") { next(); key() }
        b.result()
      }

    private def pattern(): Pattern = {
      val nodes = Seq.newBuilder[NodePat]
      val rels = Seq.newBuilder[RelPat]
      nodes += nodePat()
      while (peek.kind == "arrow" || peek.kind == "-") {
        rels += relPat()
        nodes += nodePat()
      }
      Pattern(nodes.result(), rels.result())
    }

    // `{field: literal, …}` — pattern property map (parser/ast.rs
    // NodePattern.props / RelPattern.props); desugared to equality
    // conjuncts exactly as the reference transpiler does (mod.rs:875-917)
    private def propMap(): Seq[(String, Lit)] =
      if (peek.kind != "{") Nil
      else {
        next()
        val b = Seq.newBuilder[(String, Lit)]
        def entry(): Unit = {
          val f = eat("ident").text
          eat(":")
          valueExpr() match {
            case l: Lit => b += ((f, l))
            case other  => throw new IllegalArgumentException(
              s"property map values must be literals (got $other) in: $q")
          }
        }
        entry()
        while (peek.kind == ",") { next(); entry() }
        eat("}")
        b.result()
      }

    private def nodePat(): NodePat = {
      eat("(")
      val name = if (peek.kind == "ident") Some(next().text) else None
      val label = if (peek.kind == ":") { next(); Some(eat("ident").text) } else None
      val props = propMap()
      eat(")")
      NodePat(name, props, label)
    }

    private def relPat(): RelPat = {
      // <-[e:L]-  |  -[e:L]->  |  -[e:L]-
      val leftArrow = peek.kind == "arrow" && peek.text == "<-"
      if (leftArrow) next() else { require(peek.kind == "-", s"expected - at '${peek.text}'"); next() }
      eat("[")
      val name = if (peek.kind == "ident") Some(next().text) else None
      val layer = if (peek.kind == ":") { next(); Some(eat("ident").text) } else None
      // variable-length range: *n | *a..b | *..b (min defaults to 1; an
      // explicit upper bound is required — unbounded expansion is refused)
      val range: Option[(Int, Int)] =
        if (peek.kind != "*") None
        else {
          next()
          val lo = if (peek.kind == "num") Some(eat("num").text.toInt) else None
          val hi =
            if (peek.kind == ".") {
              next(); eat(".")
              if (peek.kind == "num") Some(eat("num").text.toInt) else None
            } else lo // `*n` = exactly n
          (lo.getOrElse(1), hi) match {
            case (_, None) => throw new IllegalArgumentException(
              s"variable-length relationship needs an explicit upper bound (*a..b) in: $q")
            case (a, Some(b)) =>
              require(a >= 1 && a <= b && b <= MaxVarLenHops,
                s"variable-length bounds *$a..$b out of [1, $MaxVarLenHops] in: $q")
              Some((a, b))
          }
        }
      val props = propMap()
      eat("]")
      val rightArrow = peek.kind == "arrow" && peek.text == "->"
      if (rightArrow) next() else { require(peek.kind == "-", s"expected - at '${peek.text}'"); next() }
      require(!(leftArrow && rightArrow), "a relationship cannot point both ways")
      require(name.isEmpty || range.isEmpty,
        s"a variable-length relationship cannot be bound to a variable in: $q")
      RelPat(name, layer, if (rightArrow) 1 else if (leftArrow) -1 else 0, props, range)
    }

    private def retItem(): RetItem = {
      val e = valueExpr()
      val alias = if (kw("AS")) { next(); Some(eat("ident").text) } else None
      RetItem(e, alias)
    }

    // boolExpr := andExpr (OR andExpr)*
    private def boolExpr(): Expr = {
      var e = andExpr()
      while (kw("OR")) { next(); e = Bin("or", e, andExpr()) }
      e
    }
    private def andExpr(): Expr = {
      var e = notExpr()
      while (kw("AND")) { next(); e = Bin("and", e, notExpr()) }
      e
    }
    private def notExpr(): Expr =
      if (kw("NOT")) { next(); Not(notExpr()) }
      else cmpExpr()

    /** Lookahead for a pattern predicate `(b)-[:L]->(c)` at a WHERE
      * position where `(` could also open a boolean group: a paren section
      * with no nested parens whose close is followed by `-`/arrow can only
      * be a node pattern (value-level parens are unsupported, and a closed
      * boolean group is never followed by a dash). */
    private def looksLikePatternPredicate: Boolean = {
      var k = i + 1
      while (k < toks.length && toks(k).kind != ")" && toks(k).kind != "(") k += 1
      k + 1 < toks.length && toks(k).kind == ")" &&
        (toks(k + 1).kind == "-" || toks(k + 1).kind == "arrow")
    }

    private def cmpExpr(): Expr = {
      if (peek.kind == "(" && looksLikePatternPredicate) {
        // openCypher 9 pattern predicate — sugar for EXISTS { pattern }
        return ExistsPat(Seq(pattern()), None)
      }
      if (kw("EXISTS")) {
        // `EXISTS { [MATCH] pattern[, pattern…] [WHERE …] }` — an
        // existential subquery predicate (openCypher); NOT EXISTS arrives
        // via the generic NOT wrapper
        next()
        eat("{")
        if (kw("MATCH")) next()
        val ps = Seq.newBuilder[Pattern]
        ps += pattern()
        while (peek.kind == ",") { next(); ps += pattern() }
        val w = if (kw("WHERE")) { next(); Some(boolExpr()) } else None
        eat("}")
        return ExistsPat(ps.result(), w)
      }
      if (peek.kind == "(") {
        // lookahead: parenthesized boolean vs nothing else starts with (
        next()
        val e = boolExpr()
        eat(")")
        return e
      }
      val l = valueExpr()
      if (peek.kind == "op" || peek.kind == "=" || peek.kind == "<" || peek.kind == ">") {
        val op = next().text
        Bin(op, l, valueExpr())
      } else if (kw("CONTAINS")) { next(); Bin("contains", l, valueExpr()) }
      else if (kw("STARTS")) { next(); eatKw("WITH"); Bin("starts", l, valueExpr()) }
      else if (kw("ENDS")) { next(); eatKw("WITH"); Bin("ends", l, valueExpr()) }
      else if (kw("IN")) {
        next(); eat("[")
        val items = Seq.newBuilder[Any]
        if (peek.kind != "]") {
          items += litValue()
          while (peek.kind == ",") { next(); items += litValue() }
        }
        eat("]")
        InList(l, items.result())
      } else if (kw("IS")) {
        next()
        val neg = if (kw("NOT")) { next(); true } else false
        eatKw("NULL")
        IsNull(l, neg)
      } else throw new IllegalArgumentException(s"expected comparison at '${peek.text}' in: $q")
    }

    /** A bare literal (list elements — no nested expressions). */
    private def litValue(): Any = {
      val t = peek
      t.kind match {
        case "num" => next(); if (t.text.contains('.')) t.text.toDouble else t.text.toLong
        case "str" => next(); t.text
        case _ =>
          throw new IllegalArgumentException(s"expected a literal in list at '${t.text}' in: $q")
      }
    }

    // value grammar with arithmetic precedence: valueExpr := mulExpr
    // (('+'|'-') mulExpr)*; mulExpr := atomExpr (('*'|'/'|'%') atomExpr)*;
    // unary minus desugars to 0 - x. Value-level parentheses are not
    // supported (a leading '(' always opens a boolean group in WHERE) —
    // precedence covers the practical shapes.
    private def valueExpr(): Expr = {
      var e = mulExpr()
      while (peek.kind == "+" || peek.kind == "-") {
        val op = next().kind
        e = Bin(op, e, mulExpr())
      }
      e
    }
    private def mulExpr(): Expr = {
      var e = atomExpr()
      while (peek.kind == "*" || peek.kind == "/" || peek.kind == "%") {
        val op = next().kind
        e = Bin(op, e, atomExpr())
      }
      e
    }
    private def atomExpr(): Expr = {
      if (peek.kind == "-") { next(); return Bin("-", Lit(0L), atomExpr()) }
      val t = peek
      t.kind match {
        case "num" =>
          next()
          Lit(if (t.text.contains('.')) t.text.toDouble else t.text.toLong)
        case "str" => next(); Lit(t.text)
        case "*"   => next(); Lit("*") // only valid inside COUNT(
        case "ident" =>
          if (t.text.equalsIgnoreCase("case")) {
            // generic-form CASE (openCypher): branches evaluate in order,
            // missing ELSE yields null. The simple form (`CASE x WHEN v`)
            // is not supported — write the predicate out.
            next()
            require(kw("WHEN"), s"CASE needs WHEN (generic form) in: $q")
            val branches = Seq.newBuilder[(Expr, Expr)]
            while (kw("WHEN")) {
              next()
              val cond = boolExpr()
              eatKw("THEN")
              branches += ((cond, valueExpr()))
            }
            val els = if (kw("ELSE")) { next(); Some(valueExpr()) } else None
            eatKw("END")
            CaseWhen(branches.result(), els)
          } else if (AggFns.contains(t.text.toLowerCase)) {
            val fn = t.text.toLowerCase
            next(); eat("(")
            val distinct = if (kw("DISTINCT")) { next(); true } else false
            val arg = if (peek.kind == "*") {
              require(fn == "count", s"* is only valid inside COUNT in: $q")
              next(); None
            } else Some(valueExpr())
            require(fn == "count" || arg.nonEmpty, s"$fn needs an argument in: $q")
            eat(")")
            AggFn(fn, arg, distinct)
          } else if (t.text.equalsIgnoreCase("type")) {
            next(); eat("(")
            val v = eat("ident").text
            eat(")")
            TypeOf(v)
          } else if (ScalarFns.contains(t.text.toLowerCase) && peekAhead(1).kind == "(") {
            val fn = t.text.toLowerCase
            next(); eat("(")
            val args = Seq.newBuilder[Expr]
            if (peek.kind != ")") {
              args += valueExpr()
              while (peek.kind == ",") { next(); args += valueExpr() }
            }
            eat(")")
            val as = args.result()
            val (lo, hi, _) = ScalarFns(fn)
            require(as.size >= lo && as.size <= hi,
              s"$fn takes ${if (hi == Int.MaxValue) s"$lo+" else s"$lo..$hi"} " +
                s"arguments, got ${as.size} in: $q")
            ScalarFn(fn, as)
          } else {
            val name = next().text
            if (peek.kind == ".") { next(); Prop(name, eat("ident").text) }
            else VarRef(name)
          }
        case other =>
          throw new IllegalArgumentException(s"unexpected $other '${t.text}' in: $q")
      }
    }
  }

  // ---------- translation ----------

  private val EdgeFields = Seq("src", "dst", "ts", "event_id", "layer")
  private val AggFns = Set("count", "sum", "min", "max", "avg", "collect")
  /** Scalar functions → (arity range, Column builder). */
  private val ScalarFns: Map[String, (Int, Int, Seq[Column] => Column)] = Map(
    "coalesce" -> ((1, Int.MaxValue, (cs: Seq[Column]) => coalesce(cs: _*))),
    "abs" -> ((1, 1, (cs: Seq[Column]) => abs(cs.head))),
    "sign" -> ((1, 1, (cs: Seq[Column]) => signum(cs.head).cast("long"))),
    "tolower" -> ((1, 1, (cs: Seq[Column]) => lower(cs.head))),
    "toupper" -> ((1, 1, (cs: Seq[Column]) => upper(cs.head))),
    "size" -> ((1, 1, (cs: Seq[Column]) => length(cs.head).cast("long"))),
    "tointeger" -> ((1, 1, (cs: Seq[Column]) => cs.head.cast("long"))),
    "tostring" -> ((1, 1, (cs: Seq[Column]) => cs.head.cast("string"))),
    "trim" -> ((1, 1, (cs: Seq[Column]) => trim(cs.head))))

  /** Parse + translate a Cypher-lite query against a temporal graph. */
  def run(g: TemporalGraph, query: String): DataFrame = run(g, query, None)

  /** As [[run]], with a node-property table `(id, field, …)`: `a.field`
    * on a node variable resolves against it (left join on the node id —
    * missing nodes read null, openCypher's missing-property semantics).
    * Properties are available in MATCH WHERE (required patterns), WITH
    * items and RETURN; to use one after a WITH, carry it as an aliased
    * item. */
  def run(g: TemporalGraph, query: String, nodeProps: DataFrame): DataFrame =
    run(g, query, Some(nodeProps))

  private def run(
      g: TemporalGraph,
      query: String,
      nodeProps: Option[DataFrame]): DataFrame = {
    val parts = new P(tokenize(query), query).parseAll()
    val frames = parts.map { case (ast, _) => translate(g, query, nodeProps, ast) }
    if (frames.size == 1) frames.head
    else {
      val flags = parts.drop(1).map(_._2)
      require(flags.distinct.size == 1, s"cannot mix UNION and UNION ALL in: $query")
      val cols = frames.head.columns.toSeq
      frames.tail.foreach { f =>
        require(
          f.columns.toSeq == cols,
          s"UNION parts must return the same columns " +
            s"(${cols.mkString(", ")} vs ${f.columns.mkString(", ")}) in: $query")
      }
      val combined = frames.reduce(_ unionByName _)
      if (flags.head) combined else combined.distinct()
    }
  }

  private def translate(
      g: TemporalGraph,
      query: String,
      nodeProps: Option[DataFrame],
      ast: Ast): DataFrame = {

    // node variable v binds column nodeCol(v) — shared across patterns, so
    // pattern frames equi-join on exactly their shared variables
    def nodeCol(v: String) = s"__node_$v"

    // validations over the ORIGINAL patterns (before var-length expansion)
    // of EVERY segment. Edge variables are single-bind across the whole
    // query (a rebind would collide its 5 field columns — refused loudly,
    // a superset of openCypher's already-bound error); node variables
    // shared across clauses of one scope are the SAME binding (the
    // equi-join / left-join key).
    val allSegments: Seq[Segment] = ast.segments.map(_._1) :+ ast.last
    val clausesAll: Seq[Seq[Pattern]] =
      allSegments.flatMap(s => s.patterns +: s.optionals.map(_._1))
    clausesAll.foreach { ps =>
      ps.foreach { p =>
        val ns = p.nodes.flatMap(_.name)
        require(ns.distinct.size == ns.size,
          s"duplicate node variable within one pattern in: $query")
      }
    }
    val namedRel = clausesAll.flatMap(_.flatMap(_.rels.flatMap(_.name)))
    require(namedRel.distinct.size == namedRel.size, s"duplicate edge variable in: $query")

    /** What a frame's columns currently bind: node variables (as
      * nodeCol(v)), edge variables (as their 5 field columns), and WITH-
      * projected scalar columns (by their own name). */
    final case class Scope(nodes: Seq[String], rels: Seq[String], scalars: Seq[String])

    // ---- variable-length expansion (beyond the reference's frontend):
    // each `-[:L*a..b]->` hop expands the MATCH into a UNION of fixed-
    // length chains — fresh anonymous intermediate nodes/edges per branch,
    // the layer/prop constraints replicated onto every traversed hop; the
    // per-branch relationship-uniqueness filters below then give
    // openCypher's distinct-edges-per-path semantics. Branch count is the
    // product of per-hop length choices, bounded loudly. ----
    def expandPattern(p: Pattern): Seq[Pattern] = {
      val choices = p.rels.map(r =>
        r.range.map { case (a, b) => (a to b).toSeq }.getOrElse(Seq(1)))
      choices
        .foldLeft(Seq(Seq.empty[Int]))((acc, c) => acc.flatMap(pre => c.map(pre :+ _)))
        .map { lens =>
          val nodes = Seq.newBuilder[NodePat]
          val rels = Seq.newBuilder[RelPat]
          nodes += p.nodes.head
          p.rels.zipWithIndex.foreach { case (r, i) =>
            val k = lens(i)
            for (j <- 1 to k) {
              rels += RelPat(
                if (r.range.isEmpty) r.name else None, r.layer, r.dir, r.props)
              nodes += (if (j == k) p.nodes(i + 1) else NodePat(None))
            }
          }
          Pattern(nodes.result(), rels.result())
        }
    }

    // node-property support: `a.field` for a node variable resolves
    // against the optional nodeProps frame (id, field, …), left-joined on
    // demand as __prop_<var>_<field> columns at each compile site
    val nodePropFields: Set[String] =
      nodeProps.map(_.columns.toSet - "id").getOrElse(Set.empty)
    def propColName(v: String, f: String) = s"__prop_${v}_$f"

    /** Node-property pairs (var, field) an expression references. */
    def collectProps(e: Expr): Seq[(String, String)] = e match {
      case Prop(v, f) if f != "id" => Seq((v, f))
      case Bin(_, l, r)            => collectProps(l) ++ collectProps(r)
      case Not(x)                  => collectProps(x)
      case InList(x, _)            => collectProps(x)
      case IsNull(x, _)            => collectProps(x)
      case AggFn(_, Some(a), _)    => collectProps(a)
      case CaseWhen(bs, els) =>
        bs.flatMap { case (c, v) => collectProps(c) ++ collectProps(v) } ++
          els.toSeq.flatMap(collectProps)
      case ScalarFn(_, as)         => as.flatMap(collectProps)
      case _                       => Seq.empty
    }

    /** Left-join the needed property columns for every referenced node
      * variable still in scope (one join per variable, all its fields). */
    def withProps(frame: DataFrame, exprs: Seq[Expr], nodeVars: Seq[String]): DataFrame = {
      val needed = exprs.flatMap(collectProps).distinct.filter { case (v, f) =>
        nodeVars.contains(v) && nodePropFields.contains(f) &&
          !frame.columns.contains(propColName(v, f))
      }
      needed.groupBy(_._1).toSeq.sortBy(_._1).foldLeft(frame) {
        case (acc, (v, pairs)) =>
          // a plain equi-join on the node id — Catalyst/AQE picks the
          // strategy (a per-node property table is NOT broadcast-sized at
          // production scale)
          val pf = nodeProps.get.select(
            col("id").as("__pid") +: pairs.map { case (_, f) =>
              col(f).as(propColName(v, f))
            }: _*)
          acc.join(pf, acc(nodeCol(v)) === pf("__pid"), "left").drop("__pid")
      }
    }

    // expression compiler over a branch's (or the union's) variable maps;
    // scalarCols are WITH-projected columns, addressed by their own name;
    // withNodeProps enables `a.field` against the joined property columns
    def compiler(
        nodeColOf: Map[String, String],
        relVars: Set[String],
        scalarCols: Set[String] = Set.empty,
        withNodeProps: Boolean = false): Expr => Column = {
      def fieldCol(v: String, field: String): Column = {
        val f = field match {
          case "time" => "ts"
          case other  => other
        }
        if (relVars.contains(v)) {
          require(EdgeFields.contains(f), s"unknown edge field '$field' in: $query")
          col(s"${v}_$f")
        } else if (nodeColOf.contains(v)) {
          if (field == "id") col(nodeColOf(v))
          else if (withNodeProps && nodePropFields.contains(field))
            col(propColName(v, field))
          else throw new IllegalArgumentException(
            if (nodePropFields.contains(field))
              s"node property '$field' is not available here " +
                s"(carry it through WITH as an aliased item) in: $query"
            else
              s"node variables expose only 'id'" +
                (if (nodePropFields.nonEmpty) s" and ${nodePropFields.mkString("/")}"
                else "") + s" (got '$field') in: $query")
        } else if (scalarCols.contains(v)) {
          throw new IllegalArgumentException(
            s"WITH-projected value '$v' has no fields (got '.$field') in: $query")
        } else throw new IllegalArgumentException(s"unknown variable '$v' in: $query")
      }
      def compile(e: Expr): Column = e match {
        case Prop(v, f)   => fieldCol(v, f)
        case TypeOf(v)    => fieldCol(v, "layer")
        case VarRef(v)    =>
          if (nodeColOf.contains(v)) col(nodeColOf(v))
          else if (scalarCols.contains(v)) col(v)
          else throw new IllegalArgumentException(s"bare edge variable '$v' not valid here in: $query")
        case Lit(x)       => lit(x)
        case CaseWhen(branches, otherwise) =>
          val chained = branches.tail.foldLeft(
            when(compile(branches.head._1), compile(branches.head._2))) {
            case (acc, (c, v)) => acc.when(compile(c), compile(v))
          }
          otherwise.map(e => chained.otherwise(compile(e))).getOrElse(chained)
        case ScalarFn(fn, as) => ScalarFns(fn)._3(as.map(compile))
        case Not(x)       => !compile(x)
        case InList(x, items) => compile(x).isin(items: _*)
        case IsNull(x, neg)   => if (neg) compile(x).isNotNull else compile(x).isNull
        case Bin(op, l, r) => op match {
          case "and"      => compile(l) && compile(r)
          case "or"       => compile(l) || compile(r)
          case "="        => compile(l) === compile(r)
          case "<>"       => compile(l) =!= compile(r)
          case ">"        => compile(l) > compile(r)
          case ">="       => compile(l) >= compile(r)
          case "<"        => compile(l) < compile(r)
          case "<="       => compile(l) <= compile(r)
          case "contains" => compile(l).contains(compile(r))
          case "starts"   => compile(l).startsWith(r.asInstanceOf[Lit].value.toString)
          case "ends"     => compile(l).endsWith(r.asInstanceOf[Lit].value.toString)
          case "+"        => compile(l) + compile(r)
          case "-"        => compile(l) - compile(r)
          case "*"        => compile(l) * compile(r)
          case "/"        => compile(l) / compile(r)
          case "%"        => compile(l) % compile(r)
        }
        case _: AggFn  =>
          throw new IllegalArgumentException(
            s"aggregates are only valid in RETURN/WITH items: $query")
        case _: ExistsPat =>
          throw new IllegalArgumentException(
            s"EXISTS { … } is only supported as a top-level AND conjunct " +
              s"of a required-MATCH WHERE in: $query")
      }
      compile
    }

    /** One aggregate item → Column. `binding` maps a bare variable to the
      * column whose non-nullness means "the variable is bound" (COUNT(e)
      * semantics over OPTIONAL MATCH nulls). DISTINCT: honoured for
      * count/sum, a no-op for min/max, refused for avg. */
    def aggColumn(
        agg: AggFn,
        comp: Expr => Column,
        binding: String => Option[Column]): Column = agg.fn match {
      case "count" => (agg.arg, agg.distinct) match {
        case (None, _)       => count(lit(1))
        case (Some(a), true) => count_distinct(comp(a))
        case (Some(VarRef(v)), false) if binding(v).isDefined => count(binding(v).get)
        case (Some(a), false) => count(comp(a))
      }
      case "sum" =>
        val a = comp(agg.arg.get)
        if (agg.distinct) sum_distinct(a) else sum(a)
      case "min" => min(comp(agg.arg.get))
      case "max" => max(comp(agg.arg.get))
      case "avg" =>
        require(!agg.distinct, s"AVG(DISTINCT) is not supported in: $query")
        avg(comp(agg.arg.get))
      case "collect" =>
        // openCypher collect() gathers non-null values in no defined
        // order; we pin ASCENDING order so results are deterministic
        // (and therefore testable) — callers relying on input order
        // should ORDER BY upstream and treat the array as a set
        val a = comp(agg.arg.get)
        sort_array(if (agg.distinct) collect_set(a) else collect_list(a))
    }

    // one clause (MATCH or OPTIONAL MATCH: patterns + its own WHERE) →
    // frame projected onto the clause's union-stable RETURN-visible
    // columns, plus the clause's named node/rel variables. The WHERE and
    // relationship uniqueness are scoped to the clause (openCypher
    // scoping: an OPTIONAL MATCH's WHERE filters its candidate matches,
    // never the base rows, and may only reference the clause's own
    // variables — shared nodes included, since they are its columns too).
    def clauseFrame(
        clausePatterns: Seq[Pattern],
        clauseWhere: Option[Expr]): (DataFrame, Seq[String], Seq[String]) = {
      val cNode = clausePatterns.flatMap(_.nodes.flatMap(_.name)).distinct
      val cRel = clausePatterns.flatMap(_.rels.flatMap(_.name))
      val branchPatterns: Seq[Seq[Pattern]] =
        clausePatterns.map(expandPattern).foldLeft(Seq(Seq.empty[Pattern])) {
          (acc, alts) => acc.flatMap(pre => alts.map(pre :+ _))
        }
      require(branchPatterns.size <= MaxVarLenBranches,
        s"variable-length expansion yields ${branchPatterns.size} branches " +
          s"(> $MaxVarLenBranches) in: $query")

      // union-stable, RETURN-visible columns — identical across branches
      val stableCols: Seq[String] =
        cNode.map(nodeCol) ++ cRel.flatMap(v => EdgeFields.map(f => s"${v}_$f"))

      // one branch (fixed-length patterns) → filtered frame projected
      // onto the stable columns
      def branchFrame(branch: Seq[Pattern]): DataFrame = {
      // synthetic names for anonymous vars, unique across ALL patterns; a
      // node var repeated across patterns is the SAME binding (equi-join)
      var anon = -1
      def fresh(prefix: String): String = { anon += 1; s"__$prefix$anon" }
      val pats = branch.map { p =>
        val nv = p.nodes.map(n => n.name.getOrElse(fresh("n")))
        val rv = p.rels.map(r => r.name.getOrElse(fresh("e")))
        require(nv.distinct.size == nv.size,
          s"duplicate node variable within one pattern in: $query")
        (p, nv, rv)
      }
      val relVarB = pats.flatMap(_._3)

      def patternFrame(p: Pattern, nv: Seq[String], rv: Seq[String]): DataFrame =
        if (p.rels.isEmpty) {
          g.nodes.select(col("id").as(nodeCol(nv.head)))
        } else {
          val hops = p.rels.zipWithIndex.map { case (r, k) =>
            val v = rv(k)
            val e0 = r.layer match {
              case Some(l) => g.edges.filter(col("layer") === l)
              case None    => g.edges
            }
            val named = e0.select(
              col("src").as(s"${v}_src"), col("dst").as(s"${v}_dst"),
              col("ts").as(s"${v}_ts"), col("event_id").as(s"${v}_event_id"),
              col("layer").as(s"${v}_layer"))
            def oriented(tailIsSrc: Boolean) = named.select(
              (if (tailIsSrc) col(s"${v}_src") else col(s"${v}_dst")).as(nodeCol(nv(k))),
              (if (tailIsSrc) col(s"${v}_dst") else col(s"${v}_src")).as(nodeCol(nv(k + 1))),
              col(s"${v}_src"), col(s"${v}_dst"), col(s"${v}_ts"),
              col(s"${v}_event_id"), col(s"${v}_layer"))
            r.dir match {
              case 1  => oriented(tailIsSrc = true)
              case -1 => oriented(tailIsSrc = false)
              case 0  => oriented(tailIsSrc = true).unionByName(oriented(tailIsSrc = false))
            }
          }
          hops.reduceLeft { (acc, hop) =>
            acc.join(hop, acc.columns.intersect(hop.columns).toSeq)
          }
        }

      // multi-pattern combine: equi-join on shared node variables when any,
      // cross join for disjoint patterns (transpiler/mod.rs parse_tables_2)
      val base: DataFrame = pats
        .map { case (p, nv, rv) => patternFrame(p, nv, rv) }
        .reduceLeft { (acc, f) =>
          val shared = acc.columns.intersect(f.columns).toSeq
          if (shared.nonEmpty) acc.join(f, shared) else acc.crossJoin(f)
        }

      val compile = compiler(
        pats.flatMap(_._2).distinct.map(v => v -> nodeCol(v)).toMap,
        relVarB.toSet)

      // pattern property maps desugar to equality conjuncts, exactly the
      // reference transpiler's rel_exprs/node_exprs (mod.rs:875-917)
      val propConj: Seq[Column] = pats.flatMap { case (p, nv, rv) =>
        p.nodes.zipWithIndex.flatMap { case (n, k) =>
          n.props.map { case (f, l) => compile(Bin("=", Prop(nv(k), f), l)) }
        } ++
          p.rels.zipWithIndex.flatMap { case (r, k) =>
            r.props.map { case (f, l) => compile(Bin("=", Prop(rv(k), f), l)) }
          }
      }

      // Cypher relationship uniqueness: two rel variables in one MATCH never
      // bind the same edge (the reference emits (a.id<>b.id AND
      // a.layer=b.layer) OR a.layer<>b.layer between pattern-adjacent edges —
      // unique_edge_filter, transpiler/mod.rs:697-705; we apply the
      // equivalent ¬(same event_id ∧ same layer) to ALL pairs, openCypher's
      // MATCH-wide semantics, a superset of the reference's walk — which is
      // also what makes the expanded variable-length chains path-distinct).
      // Pairs whose patterns pin DIFFERENT static layer literals are
      // distinct by construction — elided so single-layer-per-var queries
      // keep their filter-free plans.
      val staticLayer: Map[String, String] = pats.flatMap { case (p, _, rv) =>
        p.rels.zipWithIndex.flatMap { case (r, k) => r.layer.map(rv(k) -> _) }
      }.toMap
      val uniqConj: Seq[Column] = relVarB.combinations(2).toSeq.flatMap { pair =>
        val (a, b) = (pair(0), pair(1))
        (staticLayer.get(a), staticLayer.get(b)) match {
          case (Some(la), Some(lb)) if la != lb => None
          case _ =>
            Some(!(col(s"${a}_event_id") === col(s"${b}_event_id") &&
              col(s"${a}_layer") === col(s"${b}_layer")))
        }
      }

      val conjuncts = clauseWhere.map(compile).toSeq ++ propConj ++ uniqConj
      val filtered =
        if (conjuncts.isEmpty) base else base.filter(conjuncts.reduce(_ && _))
      if (stableCols.isEmpty) filtered.select(lit(1).as("__row"))
      else filtered.select(stableCols.map(col): _*)
    }

      val f = branchPatterns.map(branchFrame).reduceLeft(_ unionByName _)
      (f, cNode, cRel)
    }

    // one segment → frame: required MATCH (its WHERE clause-scoped for the
    // FIRST segment; for post-WITH segments the WHERE may also reference
    // carried columns, so it applies AFTER the carried join), joined with
    // whatever a preceding WITH carried (equi-join on shared node
    // variables, cross join when disjoint — the multi-pattern rule), then
    // each OPTIONAL MATCH left-joined on its shared node variables:
    // bindings already made stay fixed, and a base row with no consistent
    // optional match keeps the clause's new columns null (openCypher
    // OPTIONAL MATCH semantics)
    def segmentFrame(
        seg0: Segment,
        carried: Option[(DataFrame, Scope)]): (DataFrame, Scope) = {
      // `(a:Label)` desugars to `a.node_type = 'Label'` against the node
      // property frame (labels therefore need a NAMED variable and a props
      // frame carrying node_type — both absences error loudly downstream)
      val labelConj: Seq[Expr] = seg0.patterns.flatMap(_.nodes).flatMap { n =>
        n.label.map { lbl =>
          val v = n.name.getOrElse(throw new IllegalArgumentException(
            s"a node label needs a named variable ((a:$lbl), not (:$lbl)) in: $query"))
          Bin("=", Prop(v, "node_type"), Lit(lbl)): Expr
        }
      }
      // labels inside OPTIONAL MATCH are handled per-clause below (the
      // node_type predicate joins the props frame into the optional's own
      // candidate frame BEFORE the left join, so it filters candidate
      // matches, never base rows)
      val segL =
        if (labelConj.isEmpty) seg0
        else seg0.copy(where =
          Some((seg0.where.toSeq ++ labelConj).reduce(Bin("and", _, _))))
      // EXISTS / NOT EXISTS pattern predicates compile to semi/anti JOINS,
      // not Columns — peel them off the WHERE's top-level AND conjunction
      // here (any deeper placement — under OR/inside WITH — fails loudly
      // in the expression compiler) and apply them after the base frame
      // is assembled
      def conjuncts(e: Expr): Seq[Expr] = e match {
        case Bin("and", l, r) => conjuncts(l) ++ conjuncts(r)
        case other            => Seq(other)
      }
      val (existsConj, plainConj) =
        segL.where.map(conjuncts).getOrElse(Nil).partition {
          case _: ExistsPat      => true
          case Not(_: ExistsPat) => true
          case _                 => false
        }
      val seg = segL.copy(where = plainConj.reduceOption(Bin("and", _, _)))
      existsConj.foreach { e =>
        val pats = e match {
          case Not(x: ExistsPat) => x.patterns
          case x: ExistsPat      => x.patterns
          case _                 => Nil
        }
        require(pats.flatMap(_.nodes).forall(_.label.isEmpty),
          s"node labels inside EXISTS are not supported in: $query")
      }
      // UNWIND clauses apply to the carried frame BEFORE the segment's
      // patterns join on — the unwound scalar is in scope for the MATCH's
      // WHERE (and for later UNWINDs in the same stack: cross-product
      // semantics). With nothing carried, the unwind starts from one seed
      // row, so a literal list yields its elements exactly once. explode()
      // drops empty/null lists — openCypher's UNWIND-of-empty = no rows.
      val carriedU: Option[(DataFrame, Scope)] =
        if (seg.unwinds.isEmpty) carried
        else {
          val init = carried.getOrElse(
            (
              g.edges.sparkSession.range(1).select(lit(1).as("__unwind_seed")),
              Scope(Nil, Nil, Nil)))
          val (uf, us) = seg.unwinds.foldLeft(init) { case ((f, s), u) =>
            require(
              !(s.nodes ++ s.rels ++ s.scalars).contains(u.alias),
              s"UNWIND alias '${u.alias}' collides with a variable in scope in: $query")
            val comp = compiler(
              s.nodes.map(v => v -> nodeCol(v)).toMap,
              s.rels.toSet,
              s.scalars.toSet)
            val listCol = u.list match {
              case Left(items) => array(items.map(lit): _*)
              case Right(e)    => comp(e)
            }
            (
              f.select(f.columns.map(col) :+ explode(listCol).as(u.alias): _*),
              s.copy(scalars = s.scalars :+ u.alias))
          }
          Some((uf.drop("__unwind_seed"), us))
        }
      if (seg.patterns.isEmpty) {
        // empty segment: a WITH (or UNWIND stack) fed straight into
        // another WITH or RETURN
        val (cf, cs) = carriedU.getOrElse(throw new IllegalArgumentException(
          s"internal: empty segment without a preceding WITH in: $query"))
        return (cf, cs)
      }
      val segNodes = (seg.patterns ++ seg.optionals.flatMap(_._1))
        .flatMap(_.nodes.flatMap(_.name)).distinct
      val segRels = (seg.patterns ++ seg.optionals.flatMap(_._1))
        .flatMap(_.rels.flatMap(_.name))
      val scope = carriedU match {
        case None => Scope(segNodes, segRels, Nil)
        case Some((_, cs)) =>
          Scope((cs.nodes ++ segNodes).distinct, cs.rels ++ segRels, cs.scalars)
      }
      // a WHERE that references node PROPERTIES cannot compile inside the
      // per-branch clause frames (the property columns join on at the
      // segment level) — for named-variable predicates post-frame
      // filtering is equivalent, and Catalyst pushes the filter back down
      val reqNodeVars = seg.patterns.flatMap(_.nodes.flatMap(_.name)).distinct
      val reqRelVars = seg.patterns.flatMap(_.rels.flatMap(_.name))
      val whereNeedsProps = carriedU.isEmpty && seg.where.exists(w =>
        collectProps(w).exists { case (v, f) =>
          reqNodeVars.contains(v) && nodePropFields.contains(f)
        })
      val (reqFrame0, _, _) = clauseFrame(
        seg.patterns,
        if (carriedU.isEmpty && !whereNeedsProps) seg.where else None)
      val reqFrame =
        if (!whereNeedsProps) reqFrame0
        else {
          val comp = compiler(
            reqNodeVars.map(v => v -> nodeCol(v)).toMap,
            reqRelVars.toSet, Set.empty, withNodeProps = true)
          withProps(reqFrame0, seg.where.toSeq, reqNodeVars).filter(comp(seg.where.get))
        }
      val base = carriedU match {
        case None => reqFrame
        case Some((cf, cs)) =>
          val shared = cf.columns.intersect(reqFrame.columns).toSeq
          require(shared.forall(_.startsWith("__node_")),
            s"WITH-projected name collides with a later MATCH column " +
              s"(${shared.filterNot(_.startsWith("__node_")).mkString(", ")}) in: $query")
          val joined =
            if (shared.nonEmpty) cf.join(reqFrame, shared) else cf.crossJoin(reqFrame)
          seg.where match {
            case Some(w) =>
              val comp = compiler(
                scope.nodes.map(v => v -> nodeCol(v)).toMap,
                scope.rels.toSet, cs.scalars.toSet, withNodeProps = true)
              withProps(joined, Seq(w), scope.nodes).filter(comp(w))
            case None => joined
          }
      }
      // EXISTS / NOT EXISTS: each subpattern compiles to its own clause
      // frame (inner WHERE scoped to the subpattern's variables, shared
      // nodes included), then a LEFT SEMI (ANTI for NOT) join on the
      // shared node columns — openCypher's existential semantics with no
      // row duplication; Catalyst plans the usual broadcast/hash semi.
      // Relationship uniqueness is clause-scoped (openCypher): the
      // subquery's edges may coincide with the outer MATCH's.
      val withExists = existsConj.foldLeft(base) { (acc, e) =>
        val (neg, ex) = e match {
          case Not(x: ExistsPat) => (true, x)
          case x: ExistsPat      => (false, x)
          case other => throw new IllegalStateException(s"unexpected $other")
        }
        val (ef, _, _) = clauseFrame(ex.patterns, ex.where)
        val shared = acc.columns.intersect(ef.columns)
          .filter(_.startsWith("__node_")).toSeq
        require(shared.nonEmpty,
          s"EXISTS subpattern must share at least one node variable " +
            s"with the outer MATCH in: $query")
        acc.join(ef, shared, if (neg) "left_anti" else "left_semi")
      }
      val f = seg.optionals.foldLeft(withExists) {
        case (acc, (ps, w)) =>
          val labelConjO: Seq[Expr] = ps.flatMap(_.nodes).flatMap { n =>
            n.label.map { lbl =>
              val v = n.name.getOrElse(throw new IllegalArgumentException(
                s"a node label needs a named variable ((a:$lbl), not (:$lbl)) in: $query"))
              Bin("=", Prop(v, "node_type"), Lit(lbl)): Expr
            }
          }
          val (of0, oNode, oRel) = clauseFrame(ps, w)
          val of =
            if (labelConjO.isEmpty) of0
            else {
              // filter the optional's CANDIDATES on node_type, restoring
              // the stable projection afterwards so the prop columns do
              // not leak (a base row that misses would read them null)
              val comp = compiler(
                oNode.map(v => v -> nodeCol(v)).toMap,
                oRel.toSet, Set.empty, withNodeProps = true)
              val pred = labelConjO.reduce(Bin("and", _, _))
              withProps(of0, Seq(pred), oNode)
                .filter(comp(pred))
                .select(of0.columns.toSeq.map(col): _*)
            }
          val shared = oNode.map(nodeCol).filter(acc.columns.contains)
          require(shared.nonEmpty,
            s"OPTIONAL MATCH must share at least one node variable " +
              s"with a preceding clause in: $query")
          acc.join(of, shared, "left")
      }
      (f, scope)
    }

    // WITH projection: rebind the scope to the items (implicit grouping if
    // any item aggregates), filter the projected rows, optional top-k
    def applyWith(frame0: DataFrame, scope: Scope, w: WithClause): (DataFrame, Scope) = {
      val comp = compiler(
        scope.nodes.map(v => v -> nodeCol(v)).toMap,
        scope.rels.toSet, scope.scalars.toSet, withNodeProps = true)
      val frame = withProps(frame0, w.items.map(_.expr), scope.nodes)
      // classify each item → (output columns, what it binds afterwards)
      val nodesOut = Seq.newBuilder[String]
      val relsOut = Seq.newBuilder[String]
      val scalarsOut = Seq.newBuilder[String]
      val keyCols = Seq.newBuilder[Column] // non-aggregate output columns
      val aggCols = Seq.newBuilder[Column]
      // `WITH *` prepends a bare carry of every in-scope NAMED variable
      // (openCypher); explicit items may follow after the star
      val allItems: Seq[RetItem] =
        (if (w.star)
          (scope.nodes ++ scope.rels ++ scope.scalars)
            .filterNot(_.startsWith("__")).map(v => RetItem(VarRef(v), None))
        else Seq.empty) ++ w.items
      allItems.zipWithIndex.foreach {
        case (RetItem(VarRef(v), alias), _) if scope.nodes.contains(v) =>
          val target = alias.getOrElse(v)
          nodesOut += target
          keyCols += col(nodeCol(v)).as(nodeCol(target))
        case (RetItem(VarRef(v), alias), _) if scope.rels.contains(v) =>
          val target = alias.getOrElse(v)
          relsOut += target
          EdgeFields.foreach(f => keyCols += col(s"${v}_$f").as(s"${target}_$f"))
        case (RetItem(VarRef(v), alias), _) if scope.scalars.contains(v) =>
          val target = alias.getOrElse(v)
          scalarsOut += target
          keyCols += col(v).as(target)
        case (RetItem(agg: AggFn, alias), _) =>
          val name = alias.getOrElse(throw new IllegalArgumentException(
            s"aggregates in WITH must be aliased (AS name) in: $query"))
          scalarsOut += name
          val binding: String => Option[Column] = v =>
            if (scope.rels.contains(v)) Some(col(s"${v}_src"))
            else if (scope.nodes.contains(v)) Some(col(nodeCol(v)))
            else None
          aggCols += aggColumn(agg, comp, binding).as(name)
        case (RetItem(e, alias), _) =>
          val name = alias.getOrElse(throw new IllegalArgumentException(
            s"expressions in WITH must be aliased (AS name) in: $query"))
          scalarsOut += name
          keyCols += comp(e).as(name)
      }
      val keys = keyCols.result()
      val aggs = aggCols.result()
      val newScope = Scope(nodesOut.result(), relsOut.result(), scalarsOut.result())
      val outNames = newScope.nodes.map(nodeCol) ++
        newScope.rels.flatMap(v => EdgeFields.map(f => s"${v}_$f")) ++ newScope.scalars
      require(outNames.distinct.size == outNames.size,
        s"duplicate output name in WITH items in: $query")
      require(aggs.isEmpty || !w.distinct,
        s"WITH DISTINCT cannot be combined with aggregates in: $query")
      val projected =
        if (aggs.nonEmpty) {
          val grouped =
            if (keys.isEmpty) frame.agg(aggs.head, aggs.tail: _*)
            else frame.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
          // groupBy emits key columns first, then aggregates — already the
          // carried set; just fix the column order to the declared one
          grouped.select(outNames.map(col): _*)
        } else {
          val sel = frame.select(keys: _*)
          if (w.distinct) sel.distinct() else sel
        }
      val comp2 = compiler(
        newScope.nodes.map(v => v -> nodeCol(v)).toMap,
        newScope.rels.toSet, newScope.scalars.toSet)
      val post = w.where.map(e => projected.filter(comp2(e))).getOrElse(projected)
      require(w.orderBy.isEmpty || w.limit.nonEmpty,
        s"ORDER BY in WITH requires LIMIT (it is a no-op otherwise) in: $query")
      require(w.skip.isEmpty || (w.orderBy.nonEmpty && w.limit.nonEmpty),
        s"SKIP in WITH requires ORDER BY + LIMIT (rows have no defined order otherwise) in: $query")
      val topk = (w.orderBy, w.limit) match {
        case (ord, Some(n)) if ord.nonEmpty =>
          val sorted = post.orderBy(ord.map { case (e, desc) =>
            if (desc) comp2(e).desc else comp2(e).asc
          }: _*)
          w.skip.map(sorted.offset).getOrElse(sorted).limit(n)
        case (_, Some(n)) => post.limit(n)
        case _            => post
      }
      (topk, newScope)
    }

    // pipeline: each segment joins what the preceding WITH carried
    val carried = ast.segments.foldLeft(Option.empty[(DataFrame, Scope)]) {
      case (acc, (seg, w)) =>
        val (f, s) = segmentFrame(seg, acc)
        Some(applyWith(f, s, w))
    }
    val (filtered0, finalScope) = segmentFrame(ast.last, carried)

    // RETURN-stage variable maps: the final scope's named vars only
    // (anonymous ones never survive the stable projection)
    val nodeColOf: Map[String, String] = finalScope.nodes.map(v => v -> nodeCol(v)).toMap
    val relVars = finalScope.rels.toSet
    val scalarVars = finalScope.scalars.toSet
    val nodeVar = finalScope.nodes
    val relVar = finalScope.rels
    val compile = compiler(nodeColOf, relVars, scalarVars, withNodeProps = true)

    // RETURN
    val items: Seq[RetItem] =
      if (ast.returnStar)
        nodeVar.filterNot(_.startsWith("__")).map(v => RetItem(VarRef(v), None)) ++
          relVar.filterNot(_.startsWith("__")).map(v => RetItem(VarRef(v), None)) ++
          finalScope.scalars.map(v => RetItem(VarRef(v), None))
      else ast.items

    // node properties any RETURN item or ORDER BY key references join on
    // here (one left join per variable)
    val filtered = withProps(
      filtered0, items.map(_.expr) ++ ast.orderBy.map(_._1), finalScope.nodes)

    // (input column, output name) pairs of a non-aggregate item (a whole
    // edge var expands to its 5 fields; everything else is one column)
    def itemCols(it: RetItem): Seq[(Column, String)] = it match {
      case RetItem(VarRef(v), alias) if relVars.contains(v) =>
        require(alias.isEmpty, s"cannot alias a whole edge variable: $query")
        EdgeFields.map(f => col(s"${v}_$f") -> s"${v}_$f")
      case RetItem(VarRef(v), alias) if nodeColOf.contains(v) =>
        Seq(col(nodeColOf(v)) -> alias.getOrElse(v))
      case RetItem(VarRef(v), alias) if scalarVars.contains(v) =>
        Seq(col(v) -> alias.getOrElse(v))
      case RetItem(e, alias) =>
        val default = e match {
          case Prop(v, f) => s"${v}_${if (f == "time") "ts" else f}"
          case TypeOf(v)  => s"${v}_type"
          case _: Bin => alias.getOrElse(throw new IllegalArgumentException(
            s"arithmetic RETURN items must be aliased (AS name) in: $query"))
          case _          => "expr"
        }
        Seq(compile(e) -> alias.getOrElse(default))
    }

    def aggCol(it: RetItem, k: Int): (Column, String) = {
      val RetItem(agg: AggFn, alias) = it: @unchecked
      val name = alias.getOrElse(s"${agg.fn}$k")
      // COUNT(e)/COUNT(n) counts rows where the binding is non-null (an
      // OPTIONAL MATCH miss leaves nulls; inner chains never do)
      val binding: String => Option[Column] = v =>
        if (relVars.contains(v)) Some(col(s"${v}_src"))
        else nodeColOf.get(v).map(col)
      aggColumn(agg, compile, binding) -> name
    }

    val hasAgg = items.exists(_.expr.isInstanceOf[AggFn])
    require(!(ast.distinct && hasAgg),
      s"RETURN DISTINCT cannot be combined with aggregates in: $query")
    val result: DataFrame =
      if (hasAgg) {
        // Cypher's implicit grouping (transpiler/mod.rs:372-437): the
        // non-aggregate RETURN items become the grouping keys, in order;
        // output column order follows the RETURN list
        val named = items.zipWithIndex.map {
          case (it, k) if it.expr.isInstanceOf[AggFn] => Left(aggCol(it, k))
          case (it, _)                                => Right(itemCols(it))
        }
        val keys = named.collect { case Right(cs) => cs }.flatten
        val aggs = named.collect { case Left(a) => a }.map { case (c, n) => c.as(n) }
        val grouped =
          if (keys.isEmpty) filtered.agg(aggs.head, aggs.tail: _*)
          else
            filtered
              .groupBy(keys.map { case (c, n) => c.as(n) }: _*)
              .agg(aggs.head, aggs.tail: _*)
              .select(named.flatMap {
                case Left((_, n)) => Seq(col(n))
                case Right(cs)    => cs.map { case (_, n) => col(n) }
              }: _*)
        if (ast.orderBy.nonEmpty) {
          // grouped output: ORDER BY addresses output items — match each
          // key syntactically to its output column; an aggregate is
          // addressable via its alias
          val outName: Map[Expr, String] = items.zipWithIndex.flatMap {
            case (RetItem(e, alias), k) if e.isInstanceOf[AggFn] =>
              val n = alias.getOrElse(s"${e.asInstanceOf[AggFn].fn}$k")
              Seq(e -> n) ++ alias.map(a => (VarRef(a): Expr) -> n)
            case (it @ RetItem(e, alias), _) =>
              Seq(e -> itemCols(it).head._2) ++
                alias.map(a => (VarRef(a): Expr) -> itemCols(it).head._2)
          }.toMap
          grouped.orderBy(ast.orderBy.map { case (e, desc) =>
            val c = outName.get(e).map(col).getOrElse(throw new IllegalArgumentException(
              s"ORDER BY over grouped output must name a RETURN item in: $query"))
            if (desc) c.desc else c.asc
          }: _*)
        } else grouped
      } else if (ast.distinct) {
        // RETURN DISTINCT dedups the PROJECTED rows; ORDER BY then
        // addresses the output items only (openCypher's rule — the
        // pre-projection columns are gone after the dedup)
        val cols = items.flatMap(itemCols).map { case (c, n) => c.as(n) }
        val outName: Map[Expr, String] = items.flatMap { it =>
          Seq(it.expr -> itemCols(it).head._2) ++
            it.alias.map(a => (VarRef(a): Expr) -> itemCols(it).head._2)
        }.toMap
        val deduped = filtered.select(cols: _*).distinct()
        if (ast.orderBy.nonEmpty)
          deduped.orderBy(ast.orderBy.map { case (e, desc) =>
            val c = outName.get(e).map(col).getOrElse(throw new IllegalArgumentException(
              s"ORDER BY with RETURN DISTINCT must name a RETURN item in: $query"))
            if (desc) c.desc else c.asc
          }: _*)
        else deduped
      } else {
        val cols = items.flatMap(itemCols).map { case (c, n) => c.as(n) }
        // ORDER BY may address a RETURN alias (Cypher): a bare variable
        // matching an alias resolves to that item's expression
        val aliasExpr: Map[String, Expr] =
          items.collect { case RetItem(e, Some(a)) => a -> e }.toMap
        val ordered =
          if (ast.orderBy.nonEmpty)
            filtered.orderBy(ast.orderBy.map { case (e, desc) =>
              val resolved = e match {
                case VarRef(v) if aliasExpr.contains(v) => aliasExpr(v)
                case other                              => other
              }
              if (desc) compile(resolved).desc else compile(resolved).asc
            }: _*)
          else filtered
        ordered.select(cols: _*)
      }
    require(ast.skip.isEmpty || ast.orderBy.nonEmpty,
      s"SKIP requires ORDER BY (rows have no defined order otherwise) in: $query")
    val paged = ast.skip.map(result.offset).getOrElse(result)
    ast.limit.map(paged.limit).getOrElse(paged)
  }
}
