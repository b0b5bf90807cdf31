package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}

/** The q68 equivalence discipline applied to q116: the two-phase
  * distributed rank (bucket offsets + intra-bucket row_number + rank
  * arithmetic) must be BIT-identical to the naive one-window
  * percent_rank/cume_dist form — the ordering is total and the assembled
  * divisions are the same two IEEE divisions the native functions
  * perform, so there is no rounding escape hatch. */
class RelativeRankSpec extends AnyFunSuite {

  test("q116 two-phase rank == naive one-window percent_rank/cume_dist") {
    val distributed = RelationalQueries.q116RelativeRank(spark, sfDir).collect().toSeq
    val naive = RelationalQueries.relativeRankNaive(spark, sfDir).collect().toSeq
    assert(distributed.nonEmpty)
    assert(distributed == naive)
  }
}
