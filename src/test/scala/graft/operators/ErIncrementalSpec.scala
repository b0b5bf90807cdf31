package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}

/** q315's end-to-end contract: q313's delta-only pair maintenance
  * feeding the label-propagation recompute and q177's merge rules must
  * reproduce the full-rebuild golden records — including the case that
  * JUSTIFIES the recompute design: a single new customer whose edits
  * reach members of TWO standing components merges them into one golden
  * record, relabeling vertices the delta never touched. */
class ErIncrementalSpec extends AnyFunSuite {

  private def custDf(rows: Seq[(Long, String, Int, Double, String)]) = {
    val s2 = spark
    import s2.implicits._
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
  }

  private def golden(customers: org.apache.spark.sql.DataFrame,
                     pairs: org.apache.spark.sql.DataFrame,
                     seedDir: Option[String] = None) =
    DedupQueries.goldenMerge(customers,
      DedupQueries.labelsOfPairs(spark, pairs, graft.Staging.fresh("erspec"),
        seedDir))
      .collect().map(_.toString).toSeq

  test("a bridging delta merges two standing components through the recompute") {
    // standing components around suffix roots 000000200 and 000222200 —
    // lev 3 apart (three substitutions), so they stay separate at build
    // time. The bridge suffix 000022200 is within lev 2 of BOTH roots:
    // one new customer links two genuinely separate standing components.
    val base = custDf(Seq(
      (10L, "Customer#000000200", 1, 10.0, "BUILDING"),
      (11L, "Customer#000000201", 1, 20.0, "AUTOMOBILE"),
      (20L, "Customer#000222200", 1, 30.0, "MACHINERY"),
      (21L, "Customer#000222201", 1, 40.0, "HOUSEHOLD"),
      (500L, "Customer#000555555", 1, 50.0, "FURNITURE")))
    val delta = custDf(Seq(
      (97L, "Customer#000022200", 1, 5.0, "BUILDING")))
    val stage = graft.Staging.fresh("erincspec")
    DedupQueries.fuzzyIndexBuild(spark, base, stage)

    // pre-delta: two separate components, survivors 10 and 20
    val pre = golden(base, spark.read.parquet(s"$stage/pairs"))
    assert(pre.exists(_.startsWith("[10,2,")) && pre.exists(_.startsWith("[20,2,")),
      s"standing components must start separate: $pre")

    // post-delta composition == full rebuild, and the bridge merged the
    // two standing components into ONE 5-member golden record under the
    // minimum key — vertices 20/21 relabeled though the delta never
    // touched them
    val all = base.unionByName(delta)
    val maintained = DedupQueries.fuzzyDeltaUpdate(spark, delta, stage)
      .select("ka", "kb")
    val inc = golden(all, maintained)
    val fullStage = graft.Staging.fresh("erfullspec")
    DedupQueries.fuzzyIndexBuild(spark, all, fullStage)
    val full = golden(all, spark.read.parquet(s"$fullStage/pairs").select("ka", "kb"))
    assert(inc == full, "composition over maintained pairs must equal full rebuild")
    assert(inc.exists(_.startsWith("[10,5,")),
      s"bridge must merge both components into one 5-member record: $inc")
    assert(!inc.exists(_.startsWith("[20,")),
      "the absorbed component's old survivor must no longer head a record")
    assert(!inc.exists(_.startsWith("[500,")), "untouched singleton stays out")

    // the WARM-STARTED recompute (q315's registered path: seeded from the
    // staged base labeling) must land on the same fixpoint even though
    // both merged components entered pre-collapsed under DIFFERENT seeds —
    // the adversarial case for seed-independence
    val warm = golden(all, maintained, Some(s"$stage/labels"))
    assert(warm == full, "warm-started labels must equal the cold fixpoint")
  }

  test("registered q315 == q177 on the fixture (same corpus, same golden records)") {
    val a = DedupQueries.q315ErIncremental(spark, sfDir)
      .collect().map(_.toString).toSeq
    val b = DedupQueries.q177GoldenComponents(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }
}
