package graft

import org.scalatest.funsuite.AnyFunSuite

/** q283's subset-formula Shapley against the DEFINITION: average
  * marginal contribution over all 4! channel orderings — an
  * independent derivation on pseudo-random mask histograms, plus the
  * efficiency and null-player axioms. Pure math, no Spark. */
class ShapleySpec extends AnyFunSuite {

  private val wt = Array(6L, 2L, 2L, 6L)

  private def nS(ncByMask: Map[Int, Long], sMask: Int): Long =
    ncByMask.collect { case (m, c) if (m | sMask) == sMask => c }.sum

  /** The q283 formula: Σ_S |S|!(3−|S|)!·(N(S∪c) − N(S)). */
  private def subsetFormula(nc: Map[Int, Long], bit: Int): Long =
    (0 until 16).filter(ss => (ss & bit) == 0).map { ss =>
      wt(Integer.bitCount(ss)) * (nS(nc, ss | bit) - nS(nc, ss))
    }.sum

  /** Definition: Σ over the 24 orderings of the marginal N gain when
    * the channel joins its predecessors. */
  private def permutationDefinition(nc: Map[Int, Long], bit: Int): Long =
    Seq(1, 2, 4, 8).permutations.map { perm =>
      val before = perm.takeWhile(_ != bit).foldLeft(0)(_ | _)
      nS(nc, before | bit) - nS(nc, before)
    }.sum

  private def histograms: Seq[Map[Int, Long]] = {
    var x = 12345L
    def nxt(): Long = {
      x = x * 6364136223846793005L + 1442695040888963407L
      math.abs(x % 97L)
    }
    (1 to 25).map(_ => (0 until 16).map(m => m -> nxt()).toMap)
  }

  test("subset formula equals the permutation definition on 25 " +
      "pseudo-random histograms") {
    histograms.foreach { nc =>
      for (bit <- Seq(1, 2, 4, 8))
        assert(subsetFormula(nc, bit) == permutationDefinition(nc, bit))
    }
  }

  test("efficiency: channel credits sum to 24·(N(full) − N(empty))") {
    histograms.foreach { nc =>
      val total = Seq(1, 2, 4, 8).map(subsetFormula(nc, _)).sum
      assert(total == 24L * (nS(nc, 15) - nS(nc, 0)))
    }
  }

  test("null player: a channel no converted journey touches gets 0") {
    // all conversions have masks within {click, error} = bits 1|2
    val nc = Map(0 -> 5L, 1 -> 3L, 2 -> 2L, 3 -> 7L)
    assert(subsetFormula(nc, 4) == 0L)
    assert(subsetFormula(nc, 8) == 0L)
    assert(subsetFormula(nc, 1) > 0L)
  }
}
