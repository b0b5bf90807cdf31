package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** The composed training-corpus build — the single pipeline a real
  * LLM-data run executes, chaining the per-operator stages the suite
  * proves individually: exact dedup → near-dup drop → per-language
  * outlier gate → test-set decontamination → temperature-mixture
  * sampling → token-budget shard packing. Per-operator oracles cannot see
  * composition bugs (staging lifetimes, column collisions, verdict-frame
  * contracts between stages); this entry point makes the composition
  * itself a tested, hash-checked unit (q86 + CorpusPipelineSpec).
  *
  * The reference analog is the one chained transform_load job
  * (`/root/reference/spark/transform_load.py:393-496`: clean → join →
  * split → write as a single lineage) rather than any individual query.
  *
  * Scale shape, stage by stage (each inherits the proof of its standalone
  * twin):
  *   - dedup stages: one window each over the 128-bit fingerprint
  *     (partition size = duplicate count; the near key nulls are made
  *     per-row singletons so short docs never pool into one partition);
  *   - outlier gate: bounded per-language moments broadcast back (q70);
  *   - decontamination: shingle equi-join, bench side broadcast when
  *     bounded (q64's contract);
  *   - mixture: windows over language summaries only, sampling is a
  *     per-row deterministic hash threshold — no per-language top-k
  *     window over documents, so no straggler (q69's quota made
  *     applicable);
  *   - packing: the q68 two-phase distributed prefix sum.
  *
  * Determinism: every stage verdict is a function of md5 hashes, exact
  * integer/decimal sums, or IEEE-exact double arithmetic on exact
  * operands — the family contract — so the DuckDB CTE chain reproduces
  * the manifest bit-for-bit.
  */
object CorpusPipeline {

  /** Every intermediate frame, exposed so the e2e spec can assert row
    * conservation at each stage boundary; `manifest` is the final
    * per-(lang, shard) packing table. */
  final case class Stages(input: DataFrame, exact: DataFrame, near: DataFrame,
                          gated: DataFrame, clean: DataFrame,
                          sampled: DataFrame, manifest: DataFrame)

  /** Sampling-hash threshold basis: a doc survives the mixture stage when
    * its 4-hex-digit md5 bucket (mod 10000) falls under
    * floor(min(1, quota/count) * 10000). */
  private val sampleBasis = 10000

  /** Keep the lowest-doc_id row per non-null key; rows with a null key
    * are their own singleton group (kept, and no null-pool straggler).
    * An AGGREGATE (`min_by` over the whole row, unique doc_id as the
    * tiebreaker-free ordering key), not a window: partial aggregation
    * collapses duplicates map-side before the one shuffle and no
    * per-partition sort runs — q21's dedup shape carried through the
    * pipeline. */
  private def keepMinPer(df: DataFrame, key: Column): DataFrame =
    df.groupBy(coalesce(key, concat(lit("u"), col("doc_id"))).as("k_"))
      .agg(min_by(struct(df.columns.map(col): _*), col("doc_id")).as("r_"))
      .select("r_.*")

  /** Run the full build over a (doc_id, text, lang) corpus frame against
    * a (doc_id, text) benchmark frame. `sampleBudget` is the mixture's
    * total document budget (q69's 100k made a parameter);
    * `shardTokens` the packing budget; `broadcastBench` as in
    * [[DedupQueries.decontaminate]]. */
  def build(docs: DataFrame, bench: DataFrame, sampleBudget: Long,
            shardTokens: Int, broadcastBench: Boolean = true): Stages = {
    // The downstream stages BRANCH repeatedly (moments + gate both read
    // the dedup output; decontamination + its anti-join both read the
    // gate's; mixture + sampling both read the decontamination's; the
    // two-phase packer reads the sample twice). Left as one lazy DAG,
    // every branch re-executes the whole fingerprint + dedup lineage, so
    // the two hottest cuts are STAGED through parquet (the q42/q65
    // staged-lineage pattern): `near` (everything upstream runs once) and
    // `clean` (the shingle join runs once). Measured at sf0.1: 11.7 s
    // unstaged vs 3.3 s staged steady-state (a first run adds ~6 s of
    // one-time plan optimization + codegen spread across the ~8 stage
    // actions — constant, so it vanishes at scale and in the bench's
    // median-of-3). The staging writes are EAGER (at call time) and swept
    // at JVM exit — the incrementalDedup cost note applies at scale.
    val stage = graft.Staging.fresh("corpusPipe")
    def staged(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$stage/$name")
      docs.sparkSession.read.parquet(s"$stage/$name")
    }
    // 1-2: exact then near dedup, keep-lowest-id (q21/q28 semantics)
    val printed = DedupQueries.withFingerprints(docs)
    val exact = keepMinPer(printed, col("fp"))
    val near = staged(keepMinPer(exact, col("nfp")), "near")

    // 3: per-language 2-sd length gate (q70's moments, applied as a row
    // filter over THIS stage's population)
    val withLen = near.withColumn("nch", length(col("text")).cast("long"))
    val moments = withLen.groupBy("lang").agg(
      count(lit(1)).as("n"),
      sum(col("nch").cast("decimal(38,0)")).as("s"),
      sum(expr("cast(nch as decimal(38,0)) * cast(nch as decimal(38,0))")).as("q"))
    val gated = withLen.join(broadcast(moments), Seq("lang"))
      .withColumn("mean", expr("cast(s as double) / cast(n as double)"))
      .withColumn("sd", expr(
        "case when n > 1 then sqrt(cast(n * q - s * s as double) / " +
          "cast(cast(n as decimal(38,0)) * cast(n - 1 as decimal(38,0)) as double)) end"))
      .filter(expr(
        "sd is null or sd = 0.0 or abs((cast(nch as double) - mean) / sd) <= 2.0"))
      .drop("n", "s", "q", "mean", "sd")

    // 4: decontamination — drop any doc sharing a 3-gram with the bench
    val contaminated = DedupQueries
      .decontaminate(gated.select("doc_id", "text"), bench, broadcastBench)
      .select("doc_id")
    val clean = staged(gated.join(contaminated, Seq("doc_id"), "left_anti"), "clean")

    // 5: temperature mixture applied as a deterministic hash-threshold
    // sample: rate_l = min(1, quota_l / n_l) — downsample only, never
    // upsample; the per-row test is O(1), no per-language window
    val mix = clean.groupBy("lang").agg(count(lit(1)).as("c"))
      .withColumn("total", sum("c").over(Window.partitionBy()))
      .withColumn("w", expr("sqrt(cast(c as double) / cast(total as double))"))
      .withColumn("wq", expr("cast(floor(w * 1e9) as bigint)"))
      .withColumn("share", expr("cast(wq as double) / cast(sum(wq) over () as double)"))
      .withColumn("quota", expr(s"cast(floor(share * $sampleBudget) as bigint)"))
      .withColumn("thresh", expr(
        s"cast(floor(least(cast(1.0 as double), cast(quota as double) / cast(c as double)) * $sampleBasis) as int)"))
      .select("lang", "thresh")
    val sampled = clean.join(broadcast(mix), Seq("lang"))
      .filter(expr(
        s"cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as int) % $sampleBasis < thresh"))
      .drop("thresh")

    // 6: shard packing (q68's two-phase distributed prefix sum)
    val manifest = CorpusQueries.tokenPack(
      sampled.select(col("lang"), col("doc_id"),
        expr("cast(size(split(text, ' ')) as bigint)").as("ntok")),
      shardTokens)
    Stages(docs, exact, near, gated, clean, sampled, manifest)
  }

  /** Fixture instance: corpus = the non-benchmark slice, bench = the
    * doc_id % 37 == 0 slice (q64's split); budget 200 docs (small enough
    * that the mixture stage genuinely drops rows at fixture scale), 512
    * tokens per shard (several shards per language). The bench side
    * scales with the corpus here, so it is not broadcast (q64's
    * reasoning). */
  def q86CorpusPipeline(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text", "lang")
    build(
      docs = d.filter(col("doc_id") % 37 =!= 0),
      bench = d.filter(col("doc_id") % 37 === 0).select("doc_id", "text"),
      sampleBudget = 200L, shardTokens = 512, broadcastBench = false).manifest
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q86_corpus_pipeline" -> (q86CorpusPipeline _),
  )

  /** The full pipeline as one DuckDB CTE chain — every stage expression
    * mirrors its Spark twin (and the standalone oracles of
    * q21/q28/q70/q64/q69/q68 it composes). */
  val oracles: Map[String, String] = Map(
    "q86_corpus_pipeline" ->
      s"""WITH d0 AS (SELECT doc_id, text, lang FROM documents WHERE doc_id % 37 <> 0),
         |bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 37 = 0),
         |t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM d0),
         |p AS (SELECT doc_id, lang, text, toks,
         |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
         |    CASE WHEN len(toks) >= 3 THEN array_to_string(
         |      list_sort(list_distinct(list_transform(
         |        list_transform(generate_series(1, len(toks)-2), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])),
         |        x -> md5(x))))[1:4], '') END AS nfp
         |  FROM t),
         |e AS (SELECT * FROM p QUALIFY doc_id = min(doc_id)
         |  OVER (PARTITION BY coalesce(fp, 'u' || CAST(doc_id AS VARCHAR)))),
         |ne AS (SELECT * FROM e QUALIFY doc_id = min(doc_id)
         |  OVER (PARTITION BY coalesce(nfp, 'u' || CAST(doc_id AS VARCHAR)))),
         |nl AS (SELECT *, CAST(length(text) AS BIGINT) AS nch FROM ne),
         |m AS (SELECT lang, COUNT(*) AS n,
         |    SUM(CAST(nch AS HUGEINT)) AS s,
         |    SUM(CAST(nch AS HUGEINT) * CAST(nch AS HUGEINT)) AS q
         |  FROM nl GROUP BY lang),
         |g AS (SELECT nl.*,
         |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         |    CASE WHEN n > 1 THEN sqrt(CAST(n * q - s * s AS DOUBLE) / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)) END AS sd
         |  FROM nl JOIN m USING (lang)),
         |gk AS (SELECT doc_id, lang, text, toks FROM g
         |  WHERE sd IS NULL OR sd = 0.0 OR abs((CAST(nch AS DOUBLE) - mean) / sd) <= 2.0),
         |tr AS (SELECT doc_id, unnest(list_distinct(list_transform(
         |    list_transform(generate_series(1, len(toks)-2), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])),
         |    x -> md5(x)))) AS g2
         |  FROM gk WHERE len(toks) >= 3),
         |bt AS (SELECT string_split(text, ' ') AS toks FROM bench),
         |bsh AS (SELECT DISTINCT unnest(list_distinct(list_transform(
         |    list_transform(generate_series(1, len(toks)-2), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])),
         |    x -> md5(x)))) AS g2
         |  FROM bt WHERE len(toks) >= 3),
         |contam AS (SELECT DISTINCT tr.doc_id FROM tr JOIN bsh USING (g2)),
         |dc AS (SELECT * FROM gk WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         |mixc AS (SELECT lang, COUNT(*) AS c FROM dc GROUP BY lang),
         |mixw AS (SELECT lang, c, sqrt(CAST(c AS DOUBLE) / CAST(SUM(c) OVER () AS DOUBLE)) AS w FROM mixc),
         |mixq AS (SELECT lang, c, CAST(floor(w * 1e9) AS BIGINT) AS wq FROM mixw),
         |mix AS (SELECT lang, c,
         |    CAST(floor(CAST(wq AS DOUBLE) / CAST(SUM(wq) OVER () AS DOUBLE) * 200) AS BIGINT) AS quota
         |  FROM mixq),
         |thr AS (SELECT lang,
         |    CAST(floor(least(CAST(1.0 AS DOUBLE), CAST(quota AS DOUBLE) / CAST(c AS DOUBLE)) * $sampleBasis) AS INTEGER) AS thresh
         |  FROM mix),
         |sk AS (SELECT dc.doc_id, dc.lang, dc.toks FROM dc JOIN thr USING (lang)
         |  WHERE ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
         |       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
         |       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
         |       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % $sampleBasis < thresh),
         |nt AS (SELECT lang, doc_id, CAST(len(toks) AS BIGINT) AS ntok FROM sk),
         |c AS (SELECT lang, doc_id, ntok,
         |    SUM(ntok) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM nt)
         |SELECT lang, CAST((cum - ntok) // 512 AS BIGINT) AS shard,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS tokens
         |FROM c GROUP BY lang, shard ORDER BY lang, shard""".stripMargin,
  )
}
