package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Scale-honesty contract of q50's label-propagation loop
  * (SimilarityQueries.propagateLabels): convergence must not depend on
  * summing label ids (the pre-round-6 fixpoint test compared sum(lbl)
  * across passes, which overflows a long — and under ANSI mode throws —
  * once |V| × max(id) crosses Long.MaxValue), and the loop must never
  * mutate the caller session's conf. */
class CcPropagationSpec extends AnyFunSuite {
  import graft.SparkTestSession.spark
  import spark.implicits._

  /** Stage an undirected edge list + self-loops the way q50 does. */
  private def stage(edges: Seq[(Long, Long)]): String = {
    val e = edges.toDF("src", "dst")
    val und = e.union(e.select($"dst".as("src"), $"src".as("dst")))
    val verts = und.select("src").distinct()
    val base = und.union(verts.select($"src", $"src".as("dst")))
    val dir = graft.Staging.fresh("cctest")
    base.write.mode("overwrite").parquet(s"$dir/base")
    s"$dir/base"
  }

  test("chain whose label sum overflows a long converges to the single component min") {
    // 64-vertex path graph with ids just under Long.MaxValue: summing any
    // labeling of it overflows a 64-bit sum ~60x over (and a 32-bit sum
    // astronomically), so this converges only if the fixpoint test never
    // sums labels. The chain also forces multi-pass propagation — the min
    // label must travel the whole path.
    val n = 64
    val ids = (0 until n).map(i => Long.MaxValue - i)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val labels = SimilarityQueries
      .propagateLabels(spark, stage((1 until n).map(i => (ids(i - 1), ids(i)))))
      .collect()
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before,
      "the loop must not mutate the caller session's shuffle-partition conf")
    assert(labels.length === n)
    val byV = labels.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byV.keySet === ids.toSet)
    assert(byV.values.toSet === Set(Long.MaxValue - (n - 1)),
      "every vertex must carry the component-minimum id")
  }

  test("disjoint components keep separate labels and the width conf override is honored") {
    // two components: a triangle {10,20,30} and an edge {100,200}
    val baseDir = stage(Seq((10L, 20L), (20L, 30L), (100L, 200L)))
    val ls = spark // caller session; propagateLabels clones internally
    ls.conf.set("graft.cc.loop.partitions", "2")
    try {
      val byV = SimilarityQueries.propagateLabels(ls, baseDir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byV === Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 100L -> 100L, 200L -> 100L))
    } finally ls.conf.unset("graft.cc.loop.partitions")
  }
}
