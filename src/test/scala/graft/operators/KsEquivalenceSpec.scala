package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{sfDir, spark}

/** The q68/q116 equivalence discipline applied to q174: the two-phase KS
  * statistic (data-derived 1024-cell bucket grid, offset window over
  * bucket summaries, intra-bucket cumulative counts, max(struct) sup)
  * must be BIT-identical to the naive single-window CDF — the bucket map
  * is monotone in value so bucket-then-value order IS value order, every
  * cumulative count is the same exact BIGINT, and the one reported
  * division has identical operands in both forms. */
class KsEquivalenceSpec extends AnyFunSuite {

  test("q174 two-phase bucket-grid KS == naive single-window KS") {
    val distributed = SegmentationQueries.q174KsDrift(spark, sfDir).collect().toSeq
    val naive = SegmentationQueries.ksDriftNaive(spark, sfDir).collect().toSeq
    assert(distributed.nonEmpty)
    assert(distributed == naive)
  }
}
