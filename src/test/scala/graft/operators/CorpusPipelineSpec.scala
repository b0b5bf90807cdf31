package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end composition checks for [[CorpusPipeline]] — the failure
  * modes per-operator oracles cannot see: a stage reading the wrong
  * population, a column collision between stages, a verdict frame leaking
  * rows it should have dropped, or the final manifest disagreeing with
  * the documents that actually survived. The fixture budget (20 docs,
  * 256-token shards at sf0.001) is chosen so EVERY stage drops rows —
  * a stage that silently becomes a no-op fails the strict inequalities. */
class CorpusPipelineSpec extends AnyFunSuite {
  import graft.SparkTestSession.{sfDir, spark}

  private lazy val d = graft.Tables.documents(spark, sfDir)
    .select("doc_id", "text", "lang")
  // the fixture corpus has no EXACT duplicates (every text is distinct),
  // so inject some: every 7th doc re-delivered under a new id — the
  // recrawl shape exact dedup exists for (keep-lowest-id keeps the
  // original)
  private lazy val corpus = d.filter(col("doc_id") % 37 =!= 0)
    .unionByName(d.filter(col("doc_id") % 37 =!= 0 && col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + lit(1000000L)))
  private lazy val bench = d.filter(col("doc_id") % 37 === 0).select("doc_id", "text")
  private lazy val st = CorpusPipeline.build(
    corpus, bench, sampleBudget = 20L, shardTokens = 256, broadcastBench = false)

  private def ids(df: DataFrame): Set[Long] =
    df.select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSet

  test("every stage emits a subset of its input, and every stage does real work") {
    val i0 = ids(corpus); val e = ids(st.exact); val n = ids(st.near)
    val g = ids(st.gated); val c = ids(st.clean); val s = ids(st.sampled)
    assert(e.subsetOf(i0) && n.subsetOf(e) && g.subsetOf(n) &&
      c.subsetOf(g) && s.subsetOf(c), "stages must be nested filters")
    assert(e.size < i0.size, "exact dedup dropped nothing")
    assert(n.size < e.size, "near dedup dropped nothing")
    assert(g.size < n.size, "outlier gate dropped nothing")
    assert(c.size < g.size, "decontamination dropped nothing")
    assert(s.size < c.size, "mixture sampling dropped nothing")
  }

  test("each stage's count equals its standalone-operator accounting") {
    // exact: one survivor per distinct exact fingerprint of the input
    assert(st.exact.count() ===
      DedupQueries.withFingerprints(corpus).select("fp").distinct().count())
    // near: null-print rows all survive; one survivor per distinct near
    // print among the EXACT survivors (stage populations must chain)
    assert(st.near.count() ===
      st.exact.filter(col("nfp").isNull).count() +
        st.exact.filter(col("nfp").isNotNull).select("nfp").distinct().count())
    // decontamination: the dropped set is exactly the contaminated set of
    // the GATED population against the bench
    val contaminated = ids(DedupQueries.decontaminate(
      st.gated.select("doc_id", "text"), bench, broadcastBench = false))
    assert(ids(st.gated) -- ids(st.clean) === contaminated)
  }

  test("the sampling stage is deterministic (same corpus -> same survivors)") {
    val again = CorpusPipeline.build(
      corpus, bench, sampleBudget = 20L, shardTokens = 256, broadcastBench = false)
    assert(ids(again.sampled) === ids(st.sampled))
  }

  test("the manifest conserves the sampled documents and tokens, per language and in total") {
    val sampled = st.sampled
      .select(col("lang"), col("doc_id"),
        expr("cast(size(split(text, ' ')) as bigint)").as("ntok"))
    val m = st.manifest
    assert(m.agg(sum("n_docs")).head().getLong(0) === sampled.count())
    assert(m.agg(sum("tokens")).head().getLong(0) ===
      sampled.agg(sum("ntok")).head().getLong(0))
    val perLangM = m.groupBy("lang").agg(sum("tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perLangS = sampled.groupBy("lang").agg(sum("ntok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLangM === perLangS)
    // and the distributed prefix-sum manifest is bit-equal to the naive
    // single-window packing over the same survivor population
    val naive = sampled
      .withColumn("cum", sum("ntok").over(
        Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("shard", expr("(cum - ntok) div 256"))
      .groupBy("lang", "shard")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("ntok").cast("bigint").as("tokens"))
      .select(col("lang"), col("shard").cast("bigint").as("shard"),
        col("n_docs"), col("tokens"))
      .orderBy("lang", "shard")
    assert(m.collect().toSeq === naive.collect().toSeq)
  }
}
