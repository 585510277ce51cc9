package graft.rel

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The reference's property-predicate algebra as a small ADT compiled to
 * Catalyst `Column`s (raphtory-graphql/src/model/graph/filtering.rs:340-404
 * and the engine filter views raphtory/src/db/graph/views/filter/):
 * comparisons, string matchers, set membership, null tests, boolean
 * composition, list quantifiers (First/Last/Any/All) and list aggregates
 * (Sum/Avg/Min/Max/Len).
 *
 * Compiling to `Column` keeps everything inside Catalyst — predicates push
 * down to the parquet scan and stay in whole-stage codegen; the ADT exists
 * so programmatic/remote callers (the GraphQL-filter analog) can build
 * filters without string SQL.
 */
object Predicates {

  sealed trait Pred { def compile: Column }

  // field reference + literal
  final case class F(name: String) {
    def ===(v: Any): Pred = Cmp(name, "eq", v)
    def !==(v: Any): Pred = Cmp(name, "ne", v)
    def >(v: Any): Pred = Cmp(name, "gt", v)
    def >=(v: Any): Pred = Cmp(name, "ge", v)
    def <(v: Any): Pred = Cmp(name, "lt", v)
    def <=(v: Any): Pred = Cmp(name, "le", v)
    def startsWith(s: String): Pred = Str(name, "starts", s)
    def endsWith(s: String): Pred = Str(name, "ends", s)
    def containsStr(s: String): Pred = Str(name, "contains", s)
    def notContains(s: String): Pred = Not(Str(name, "contains", s))
    def isIn(vs: Any*): Pred = In(name, vs, negated = false)
    def isNotIn(vs: Any*): Pred = In(name, vs, negated = true)
    def isSome: Pred = NullTest(name, some = true)
    def isNone: Pred = NullTest(name, some = false)
    // list quantifiers / aggregates (reference filtering.rs:385-404)
    def first: ListElem = ListElem(name, "first")
    def last: ListElem = ListElem(name, "last")
    def any(inner: Column => Column): Pred = Quant(name, exists = true, inner)
    def all(inner: Column => Column): Pred = Quant(name, exists = false, inner)
    def len: Column = size(col(name)).cast("long")
    def sumList: Column = aggregate(col(name), lit(0.0), (acc, x) => acc + x.cast("double"))
    def avgList: Column = sumList / greatest(size(col(name)), lit(1)).cast("double")
    def minList: Column = array_min(col(name))
    def maxList: Column = array_max(col(name))
  }

  final case class ListElem(name: String, which: String) {
    // try_element_at: empty lists yield NULL → predicate false (ANSI
    // element_at would throw on empty arrays)
    private def elem: Column =
      if (which == "first") try_element_at(col(name), lit(1))
      else try_element_at(col(name), lit(-1))
    def ===(v: Any): Pred = Raw(elem === lit(v))
    def >(v: Any): Pred = Raw(elem > lit(v))
    def <(v: Any): Pred = Raw(elem < lit(v))
  }

  final case class Cmp(name: String, op: String, v: Any) extends Pred {
    def compile: Column = op match {
      case "eq" => col(name) === lit(v)
      case "ne" => col(name) =!= lit(v)
      case "gt" => col(name) > lit(v)
      case "ge" => col(name) >= lit(v)
      case "lt" => col(name) < lit(v)
      case "le" => col(name) <= lit(v)
    }
  }

  final case class Str(name: String, op: String, s: String) extends Pred {
    def compile: Column = op match {
      case "starts" => col(name).startsWith(s)
      case "ends" => col(name).endsWith(s)
      case "contains" => col(name).contains(s)
    }
  }

  final case class In(name: String, vs: Seq[Any], negated: Boolean) extends Pred {
    def compile: Column = {
      val c = col(name).isin(vs: _*)
      if (negated) !c else c
    }
  }

  final case class NullTest(name: String, some: Boolean) extends Pred {
    def compile: Column = if (some) col(name).isNotNull else col(name).isNull
  }

  final case class Quant(name: String, exists: Boolean, inner: Column => Column) extends Pred {
    def compile: Column =
      if (exists) org.apache.spark.sql.functions.exists(col(name), inner)
      else forall(col(name), inner)
  }

  final case class And(l: Pred, r: Pred) extends Pred { def compile: Column = l.compile && r.compile }
  final case class Or(l: Pred, r: Pred) extends Pred { def compile: Column = l.compile || r.compile }
  final case class Not(p: Pred) extends Pred { def compile: Column = !p.compile }
  final case class Raw(c: Column) extends Pred { def compile: Column = c }

  implicit final class PredOps(private val p: Pred) extends AnyVal {
    def &&(o: Pred): Pred = And(p, o)
    def ||(o: Pred): Pred = Or(p, o)
    def unary_! : Pred = Not(p)
  }
}
