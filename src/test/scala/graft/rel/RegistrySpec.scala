package graft.rel

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards for the query registry: a typo'd oracle key
  * would silently downgrade a query to the weaker rows-only check, and a
  * duplicate query name would silently drop an operator from the gate. */
class RegistrySpec extends AnyFunSuite {

  test("every oracle key names a registered query") {
    val orphans = Queries.oracles.keySet -- Queries.all.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("every query carries full oracle SQL — no rows-only checks") {
    val rowsOnly = Queries.all.keySet -- Queries.oracles.keySet
    // since r5 even arbitrary-graph Louvain replays pinned local-moving
    // rounds in SQL; growing this set is a deliberate, documented
    // decision, not an accident
    assert(rowsOnly.isEmpty, s"unexpected rows-only queries: $rowsOnly")
  }

  test("registry is non-trivially sized and names are well-formed") {
    assert(Queries.all.size >= 106, s"query registry shrank: ${Queries.all.size}")
    val bad = Queries.all.keySet.filterNot(_.matches("q_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming query names: $bad")
  }
}
