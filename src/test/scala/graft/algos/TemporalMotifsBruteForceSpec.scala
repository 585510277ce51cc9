package graft.algos

import org.scalatest.funsuite.AnyFunSuite

/**
 * Brute-force (explicit triple enumeration) models of the three motif
 * counting kernels, property-tested against the O(events) sliding-window
 * implementations in [[TemporalMotifs]].
 *
 * These models pin down the *combinatorial* semantics the kernels compute
 * (ordered position triples i1<i2<i3 with t3 − t1 ≤ delta, classified by
 * neighbour-equality / role patterns) — the same definitions the DuckDB
 * oracle SQL for `q_graph_temporal_motifs` / `_local` re-implements
 * relationally. If a kernel and its model ever disagree, the oracle is
 * wrong too; this spec is the bridge that keeps them honest.
 */
class TemporalMotifsBruteForceSpec extends AnyFunSuite {

  // ---- brute-force models ----

  /** Two-node: every position triple within delta, slot = dir triple. */
  private def bruteTwo(times: Array[Long], dirs: Array[Int], delta: Long): Array[Long] = {
    val out = new Array[Long](8)
    val l = times.length
    for {
      i <- 0 until l
      j <- i + 1 until l
      k <- j + 1 until l
      if times(k) - times(i) <= delta
    } out(4 * dirs(i) + 2 * dirs(j) + dirs(k)) += 1
    out
  }

  /** Star: pre block counts triples whose FIRST TWO events share a
    * neighbour, mid FIRST+LAST, post LAST TWO (each block unconstrained on
    * the third event's neighbour — the all-equal triples are subtracted by
    * the caller via the two-node vector). */
  private def bruteStar(
      times: Array[Long],
      dirs: Array[Int],
      nbrs: Array[Long],
      delta: Long): Array[Long] = {
    val out = new Array[Long](24)
    val l = times.length
    for {
      i <- 0 until l
      j <- i + 1 until l
      k <- j + 1 until l
      if times(k) - times(i) <= delta
    } {
      val m = 4 * dirs(i) + 2 * dirs(j) + dirs(k)
      if (nbrs(i) == nbrs(j)) out(m) += 1
      if (nbrs(i) == nbrs(k)) out(8 + m) += 1
      if (nbrs(j) == nbrs(k)) out(16 + m) += 1
    }
    out
  }

  /** Triangle: triples with exactly one u–v event and two w-events of
    * opposite `uorv`, classified by the u–v event's position:
    *  - uv last ("pre"):  slot = [uorv₁==d] + 4·(1−dir₁) + 2·(1−dir₂)
    *  - uv first ("post"): slot = (uorv₂==d ? 0 : 4) + 2·dir₂ + (1−dir₃)
    *  - uv middle ("mid"): slot = (uorv₁==d ? 0 : 2) + 4·dir₁ + dir₃
    * where d is the uv event's dir and subscripts are positions among the
    * two w-events (earlier/later). */
  private def bruteTriangle(
      times: Array[Long],
      uvE: Array[Boolean],
      uorv: Array[Int],
      dirs: Array[Int],
      delta: Long): Array[Long] = {
    val out = new Array[Long](8)
    val l = times.length
    for {
      i <- 0 until l
      j <- i + 1 until l
      k <- j + 1 until l
      if times(k) - times(i) <= delta
    } {
      if (uvE(k) && !uvE(i) && !uvE(j) && uorv(i) != uorv(j)) {
        val d = dirs(k)
        out((if (uorv(i) == d) 1 else 0) + 4 * (1 - dirs(i)) + 2 * (1 - dirs(j))) += 1
      } else if (uvE(i) && !uvE(j) && !uvE(k) && uorv(j) != uorv(k)) {
        val d = dirs(i)
        out((if (uorv(j) == d) 0 else 4) + 2 * dirs(j) + (1 - dirs(k))) += 1
      } else if (uvE(j) && !uvE(i) && !uvE(k) && uorv(i) != uorv(k)) {
        val d = dirs(j)
        out((if (uorv(i) == d) 0 else 2) + 4 * dirs(i) + dirs(k)) += 1
      }
    }
    out
  }

  // ---- randomized instances (sorted times WITH ties — the Spark callers
  // sort by (ts, event_id), so equal timestamps at distinct positions are
  // legal inputs) ----

  private def randomTimes(rng: scala.util.Random, l: Int, span: Int): Array[Long] =
    Array.fill(l)(rng.nextInt(span).toLong).sorted

  test("two-node kernel == brute force on 200 random instances") {
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 200) {
      val l = 3 + rng.nextInt(30)
      val times = randomTimes(rng, l, 40)
      val dirs = Array.fill(l)(rng.nextInt(2))
      val delta = 1L + rng.nextInt(30)
      val got = TemporalMotifs.twoNodeCounts(times, dirs, delta)
      val want = bruteTwo(times, dirs, delta)
      assert(got.toSeq == want.toSeq, s"trial $trial delta=$delta times=${times.toSeq} dirs=${dirs.toSeq}")
    }
  }

  test("star kernel == brute force on 200 random instances") {
    val rng = new scala.util.Random(43)
    for (trial <- 0 until 200) {
      val l = 3 + rng.nextInt(30)
      val times = randomTimes(rng, l, 40)
      val dirs = Array.fill(l)(rng.nextInt(2))
      val nbrs = Array.fill(l)(rng.nextInt(4).toLong)
      val delta = 1L + rng.nextInt(30)
      val got = TemporalMotifs.starCounts(times, dirs, nbrs, delta)
      val want = bruteStar(times, dirs, nbrs, delta)
      assert(
        got.toSeq == want.toSeq,
        s"trial $trial delta=$delta times=${times.toSeq} dirs=${dirs.toSeq} nbrs=${nbrs.toSeq}")
    }
  }

  test("triangle kernel == brute force on 400 random instances") {
    val rng = new scala.util.Random(44)
    for (trial <- 0 until 400) {
      val l = 3 + rng.nextInt(30)
      val times = randomTimes(rng, l, 40)
      val uvE = Array.fill(l)(rng.nextBoolean())
      val uorv = Array.fill(l)(rng.nextInt(2))
      val dirs = Array.fill(l)(rng.nextInt(2))
      val delta = 1L + rng.nextInt(30)
      val got = TemporalMotifs.triangleCounts(times, uvE, uorv, dirs, delta)
      val want = bruteTriangle(times, uvE, uorv, dirs, delta)
      assert(
        got.toSeq == want.toSeq,
        s"trial $trial delta=$delta times=${times.toSeq} uv=${uvE.toSeq} uorv=${uorv.toSeq} dirs=${dirs.toSeq}")
    }
  }
}
