package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-9 fifth wave: segmentation / allocation analytics — exact
  * distributed quantile ASSIGNMENT (RFM tertiles), share-of-total
  * ratios, robust dispersion (median absolute deviation), and exact
  * integer proration (largest remainder). Reference analog: the
  * "contingency bucket" analytics of `/root/reference/sql/
  * aggregations.sql:45-71` (CASE-bucketed counts) generalized from
  * hand-picked thresholds to data-derived exact quantile boundaries.
  *
  * All rank selection follows the q138/q68 two-phase discipline —
  * bucket counts on a scaling key, rank offsets from windows over
  * bucket SUMMARIES, intra-bucket row_number — never a global sort of
  * entity rows or a bounded-enum scan-level window (StragglerGuardSpec
  * sweeps these plans). Cross-row sums are BIGINT-exact on quantized
  * grids; each emitted double is one correctly-rounded op chain
  * mirrored verbatim in the oracle.
  */
object SegmentationQueries {

  // ------------------------------------------------------------ helpers

  /** Exact global boundary rows of `df` at the given 1-based `ranks`
    * under the TOTAL (v, ck) order — the two-phase selection: per-bucket
    * counts, a rank-offset window over bucket summaries (bounded rows),
    * then row_number inside only the target buckets. Returns one row per
    * rank: (rank, bv, bck). `bucket` must be monotone in v (floor-scale
    * binning) so bucket order == value order. */
  private def rankBoundaries(df: DataFrame, v: Column, ck: Column,
      bucket: Column, ranks: Seq[Long]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val base = df.select(v.as("v"), ck.as("ck"), bucket.as("b"))
    val wOff = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    val sums = base.groupBy("b").agg(count(lit(1)).as("bc"))
      .withColumn("off", coalesce(sum("bc").over(wOff), lit(0L)))
    val rdf = ranks.toDF("rank")
    val targets = sums.join(broadcast(rdf),
        col("off") < col("rank") && col("rank") <= col("off") + col("bc"))
      .select("b", "off", "rank")
    base.join(broadcast(targets), Seq("b"))
      .withColumn("rn", col("off") +
        row_number().over(Window.partitionBy("b", "rank").orderBy("v", "ck")))
      .filter(col("rn") === col("rank"))
      .select(col("rank"), col("v").as("bv"), col("ck").as("bck"))
  }

  /** Tertile assignment under the total (v, ck) order against the two
    * collected boundary rows (bounded driver scalars, the q19 mirror
    * class): 1 if (v, ck) <= b1, 2 if <= b2, else 3. */
  private def tertile(v: Column, ck: Column,
      b1: (Long, Long), b2: (Long, Long)): Column =
    when(v < b1._1 || (v === b1._1 && ck <= b1._2), 1)
      .when(v < b2._1 || (v === b2._1 && ck <= b2._2), 2)
      .otherwise(3)

  /** Exact per-group median via the q138 two-phase selection, over a
    * (g, v) frame: returns (g, n, median) with median = (v_rlo + v_rhi)
    * / 2 at ranks (n+1) div 2 and n div 2 + 1. `bucket` must be
    * monotone in v. */
  private def groupMedian(gv: DataFrame, bucket: Column): DataFrame = {
    val base = gv.withColumn("vb", bucket)
    val wOff = Window.partitionBy("g").orderBy("vb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val summaries = base.groupBy("g", "vb").agg(count(lit(1)).as("bc"))
      .withColumn("off", coalesce(sum("bc").over(wOff), lit(0L)))
      .withColumn("n", sum("bc").over(Window.partitionBy("g")))
    val targets = summaries
      .withColumn("rlo", expr("(n + 1) div 2"))
      .withColumn("rhi", expr("n div 2 + 1"))
      .filter((col("off") < col("rlo") && col("rlo") <= col("off") + col("bc")) ||
              (col("off") < col("rhi") && col("rhi") <= col("off") + col("bc")))
      .select("g", "vb", "off", "n", "rlo", "rhi")
    val wIntra = Window.partitionBy("g", "vb").orderBy("v")
    base.join(broadcast(targets), Seq("g", "vb"))
      .withColumn("rn", col("off") + row_number().over(wIntra))
      .filter(col("rn") === col("rlo") || col("rn") === col("rhi"))
      .groupBy("g")
      .agg(first("n").as("n"),
        ((min(when(col("rn") === col("rlo"), col("v"))) +
          min(when(col("rn") === col("rhi"), col("v")))) / 2.0).as("median"))
  }

  // ---------------------------------------------------------------- q150

  /** RFM customer segmentation with EXACT data-derived tertiles. Per
    * customer: recency (days from last order to the corpus anchor
    * date), frequency (order count), monetary (cent-exact lifetime
    * total). Each dimension's tertile boundaries are the values at
    * global ranks n/3 and 2n/3 under the total (value, custkey) order —
    * computed by [[rankBoundaries]] (two-phase, never a global entity
    * sort) and collected as bounded scalars (two rows per dimension).
    * Assignment is a tuple comparison against those literals, so ties
    * straddling a boundary split deterministically and every tertile
    * has an exact size. Output: one row per non-empty segment
    * ("rXfYmZ") with its population and monetary mass.
    *
    * Scale: the per-customer frame is one shuffle of the orders fact on
    * its entity key; each boundary pass shuffles that frame once on a
    * bucket key; assignment is a broadcast of 6 scalar rows. Nothing
    * sorts entity rows globally. */
  def q150RfmSegments(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    // bounded driver scalar: the corpus anchor date (max order date)
    val anchor = orders.agg(max(col("o_orderdate").cast("date"))).head().getDate(0)
    // the per-customer frame feeds FIVE consumers (three boundary
    // passes, the count, the final assignment) — stage it once so each
    // reads a leaf scan (the q86/q141 staging discipline)
    val stageDir = graft.Staging.fresh("rfm")
    orders.groupBy(col("o_custkey").as("ck"))
      .agg(datediff(lit(anchor), max(col("o_orderdate").cast("date")))
             .cast("bigint").as("r"),
           count(lit(1)).as("f"),
           sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("m"))
      .write.mode("overwrite").parquet(s"$stageDir/pc")
    val pc = s.read.parquet(s"$stageDir/pc")
    val n = pc.count()
    // tertile ranks n/3 and 2n/3 are 0 below n = 3, and bounds() then
    // indexes two boundary rows that don't exist — fail with a message
    // instead of an opaque ArrayIndexOutOfBounds
    require(n >= 3, s"q150: tertile assignment needs >= 3 customers, got $n")
    val ranks = Seq(n / 3, 2 * n / 3)
    def bounds(vc: String, bucket: Column): ((Long, Long), (Long, Long)) = {
      val rows = rankBoundaries(pc, col(vc), col("ck"), bucket, ranks)
        .orderBy("rank").collect()
      ((rows(0).getLong(1), rows(0).getLong(2)),
       (rows(1).getLong(1), rows(1).getLong(2)))
    }
    val (r1, r2) = bounds("r", col("r"))                   // days: unit buckets
    val (f1, f2) = bounds("f", col("f"))                   // counts: unit buckets
    val (m1, m2) = bounds("m", expr("m div 100000"))       // cents: 1k-unit buckets
    pc.select(col("ck"), col("m"),
        concat(lit("r"), tertile(col("r"), col("ck"), r1, r2).cast("string"),
               lit("f"), tertile(col("f"), col("ck"), f1, f2).cast("string"),
               lit("m"), tertile(col("m"), col("ck"), m1, m2).cast("string"))
          .as("segment"))
      .groupBy("segment")
      .agg(count(lit(1)).cast("bigint").as("n_customers"),
        sum("m").cast("bigint").as("m_cents_total"))
      .orderBy("segment")
  }

  // ---------------------------------------------------------------- q151

  /** Share-of-total (RATIO_TO_REPORT) over the region ⟶ nation revenue
    * hierarchy: each nation's cent-exact revenue as a share of its
    * region and of the global total. Revenue is BIGINT-exact in 1e-4
    * currency units (cents x integer discount percent); the two shares
    * are each ONE double division over exact integers, computed from
    * windows over the 25-row nation SUMMARY frame (never over lineitem
    * rows — the q68 summary-window discipline).
    *
    * Scale: one fact shuffle (groupBy nation after the dim joins — all
    * AQE-broadcast at runtime); everything after rides bounded summary
    * rows. */
  def q151ShareOfTotal(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region_name"), col("n_name").as("nation_name"),
        (expr("cast(round(l_extendedprice * 100) as bigint)") *
         (lit(100L) - expr("cast(round(l_discount * 100) as bigint)")))
          .as("rev_e4"))
      .groupBy("region_name", "nation_name")
      .agg(sum("rev_e4").as("rev_e4"))
    rev
      .withColumn("region_e4",
        sum("rev_e4").over(Window.partitionBy("region_name")))
      .withColumn("global_e4", sum("rev_e4").over(Window.partitionBy()))
      .select(col("region_name"), col("nation_name"),
        col("rev_e4").cast("bigint").as("rev_e4"),
        (col("rev_e4").cast("double") / col("region_e4").cast("double"))
          .as("share_of_region"),
        (col("rev_e4").cast("double") / col("global_e4").cast("double"))
          .as("share_of_global"))
      .orderBy("region_name", "nation_name")
  }

  // ---------------------------------------------------------------- q152

  /** Robust dispersion per event type: exact median and median absolute
    * deviation (MAD), each via the [[groupMedian]] two-phase selection —
    * the robust outlier gate next to q70's moment-based one (medians
    * shrug off the heavy tail that inflates a stddev). The deviation
    * pass reuses the first pass's 5-row median frame as a broadcast
    * literal join, so the fact table is scanned twice and sorted never.
    * Both engines assemble median and MAD from identical rank values
    * with the identical (lo + hi) / 2 arithmetic. */
  def q152RobustStats(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type").as("g"), col("value").as("v"))
    val med = groupMedian(ev, expr("cast(floor(v) as bigint)"))
    val dev = ev.join(broadcast(med.select(col("g"), col("median"))), Seq("g"))
      .select(col("g"), abs(col("v") - col("median")).as("v"))
    val mad = groupMedian(dev, expr("cast(floor(v) as bigint)"))
      .select(col("g"), col("median").as("mad"))
    med.join(mad, Seq("g"))
      .select(col("g").as("event_type"), col("n").cast("bigint").as("n"),
        col("median"), col("mad"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q153

  /** Exact integer proration by largest remainder (Hamilton's method):
    * allocate 1000 units per order across its line items proportional
    * to quantity, with floor quotas first and the leftover units going
    * to the largest fractional remainders (ties: lowest line number).
    * The budget-allocation primitive (impressions, costs, samples) in
    * the form that is exactly conserved per group — AllocationSpec
    * asserts sum(alloc) == 1000 for every order.
    *
    * Scale: all windows partition by the order key (entity, bounded
    * per-key fan-out — the q132 rule); arithmetic is pure BIGINT
    * (quotient/remainder), so the result is engine-exact with no
    * floating point anywhere. */
  def q153LargestRemainder(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey")
    val wRank = Window.partitionBy("l_orderkey")
      .orderBy(desc("rem"), asc("l_linenumber"))
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 3000)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("cast(l_quantity as bigint)").as("qty"))
      .withColumn("qsum", sum("qty").over(w))
      .withColumn("base", expr("(1000 * qty) div qsum"))
      .withColumn("rem", expr("(1000 * qty) % qsum"))
      .withColumn("leftover", lit(1000L) - sum("base").over(w))
      .withColumn("alloc",
        col("base") + when(row_number().over(wRank) <= col("leftover"), 1L)
          .otherwise(0L))
      .select(col("l_orderkey"), col("l_linenumber").cast("int").as("l_linenumber"),
        col("qty"), col("alloc"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ---------------------------------------------------------------- q162

  /** Deterministic A/B experiment readout with a Welch t statistic:
    * users are assigned to arms by a salted md5 nibble (the q88
    * split-manifest idiom — reproducible, uncorrelated with behavior),
    * the per-user metric is lifetime purchase value, and the arm
    * comparison reports means plus the e6-quantized Welch t. The
    * experiment-analysis primitive a product warehouse runs daily.
    *
    * Exactness: per-user metrics are centi-unit BIGINTs; each arm's
    * n/Σm/Σm² are exact integer aggregates (|m| <= ~1.5e6 centi, Σm² <=
    * ~3e14 — int64 headroom documented); mean, Welch variance
    * var = (n·Q − S²)/(n·(n−1)), standard error and t run the identical
    * op chain in both engines with a terminal floor. Two shuffles
    * (user_id, then the 2-row arm aggregate); the arm join is a bounded
    * 1-row cross join each side. */
  def q162AbTest(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase",
          expr("cast(round(value * 100) as bigint)")).otherwise(0L)).as("m"))
      .withColumn("arm",
        when(expr("substring(md5(concat('ab1_', cast(user_id as string))), 1, 1)")
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), "A").otherwise("B"))
    val arms = perUser.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("m").as("sm"),
        sum(col("m") * col("m")).as("qm"))
    val a = arms.filter(col("arm") === "A")
      .select(col("n").as("na"), col("sm").as("sa"), col("qm").as("qa"))
    val b = arms.filter(col("arm") === "B")
      .select(col("n").as("nb"), col("sm").as("sb"), col("qm").as("qb"))
    a.crossJoin(b)
      .withColumn("mean_a_c", col("sa").cast("double") / col("na").cast("double"))
      .withColumn("mean_b_c", col("sb").cast("double") / col("nb").cast("double"))
      .withColumn("var_a",
        (col("na") * col("qa") - col("sa") * col("sa")).cast("double") /
          (col("na") * (col("na") - lit(1L))).cast("double"))
      .withColumn("var_b",
        (col("nb") * col("qb") - col("sb") * col("sb")).cast("double") /
          (col("nb") * (col("nb") - lit(1L))).cast("double"))
      .withColumn("t",
        (col("mean_a_c") - col("mean_b_c")) /
          sqrt(col("var_a") / col("na").cast("double") +
               col("var_b") / col("nb").cast("double")))
      .select(col("na").cast("bigint").as("n_a"),
        col("nb").cast("bigint").as("n_b"),
        (col("mean_a_c") / lit(100.0)).as("mean_a"),
        (col("mean_b_c") / lit(100.0)).as("mean_b"),
        floor(col("t") * lit(1000000.0)).cast("bigint").as("t_e6"))
  }

  // ---------------------------------------------------------------- q166

  /** Exact GINI COEFFICIENT of customer spend — the inequality /
    * concentration diagnostic (q81's concentration curve reduced to its
    * scalar): gini = (2·Σᵢ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) with x sorted
    * ascending and i the 1-based global rank. The global rank comes
    * from the q116 two-phase discipline — per-bucket counts, offsets
    * from a window over bucket SUMMARIES, intra-bucket row_number under
    * the total (spend, custkey) order — never a global entity sort.
    * Σ rank·x is BIGINT-exact (rank <= n, x <= ~5e7 centi: Σ <= ~1e14,
    * 5 orders inside int64; the quantization-scale knob applies at
    * production n); the final division is one mirrored double chain
    * with terminal floor. */
  def q166Gini(s: SparkSession, dir: String): DataFrame = {
    val pc = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("m"))
      .withColumn("vb", expr("m div 1000000"))
    val wOff = Window.orderBy("vb").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = pc.groupBy("vb").agg(count(lit(1)).as("bc"))
      .withColumn("off", coalesce(sum("bc").over(wOff), lit(0L)))
      .select("vb", "off")
    val wIntra = Window.partitionBy("vb").orderBy("m", "ck")
    pc.join(offsets, Seq("vb"))
      .withColumn("rank", col("off") + row_number().over(wIntra))
      .agg(count(lit(1)).as("n"), sum("m").as("s0"),
        sum(col("rank") * col("m")).as("s1"))
      .select(col("n").cast("bigint").as("n_customers"),
        col("s0").cast("bigint").as("total_cents"),
        floor((lit(2L) * col("s1") - (col("n") + lit(1L)) * col("s0"))
            .cast("double") / (col("n") * col("s0")).cast("double") *
            lit(1000000.0))
          .cast("bigint").as("gini_e6"))
  }

  // ---------------------------------------------------------------- q167

  /** WEIGHTED median document length per language — the smallest
    * (n_chars, doc_id) at which the cumulative CHARACTER mass reaches
    * half the language's total: "half this language's bytes live in
    * documents this short", the right centering statistic for packing
    * and truncation decisions (q120's waste profile consumes exactly
    * this boundary). Selection is the [[groupMedian]] two-phase shape
    * with WEIGHTS: per-(lang, length-bucket) weight sums, a rank-offset
    * window over bucket summaries, then an intra-bucket cumulative
    * weight under the total (n_chars, doc_id) order picks the first
    * row crossing ceil(W/2). Pure integer arithmetic end to end. */
  def q167WeightedMedian(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"), col("n_chars").as("w"))
      .withColumn("vb", expr("w div 64"))
    val wOff = Window.partitionBy("lang").orderBy("vb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val summaries = docs.groupBy("lang", "vb").agg(sum("w").as("bw"))
      .withColumn("woff", coalesce(sum("bw").over(wOff), lit(0L)))
      .withColumn("wtot", sum("bw").over(Window.partitionBy("lang")))
      .withColumn("target", expr("(wtot + 1) div 2"))
    val targets = summaries
      .filter(col("woff") < col("target") &&
              col("target") <= col("woff") + col("bw"))
      .select("lang", "vb", "woff", "wtot", "target")
    val wIntra = Window.partitionBy("lang", "vb").orderBy("w", "doc_id")
    docs.join(broadcast(targets), Seq("lang", "vb"))
      .withColumn("cum", col("woff") + sum("w").over(
        wIntra.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum") >= col("target"))
      .groupBy("lang")
      .agg(first("wtot").as("wtot"),
        min(struct(col("w"), col("doc_id"))).getField("w").as("med_len"))
      .select(col("lang"), col("wtot").cast("bigint").as("total_chars"),
        col("med_len").cast("bigint").as("weighted_median_len"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------- q170

  /** TWO-PHASE distributed top-k per group — top-3 parts per nation by
    * exact revenue WITHOUT a per-group global sort: phase 1 ranks
    * within (nation, part-hash-bucket) and keeps each bucket's top 3;
    * phase 2 ranks the <= 3·nBuckets survivors per nation. Pigeonhole:
    * the true global top-3 survive phase 1 in whatever buckets they
    * hash to, so the phases are LOSSLESS for k <= bucket keep-depth.
    * This is the q111/q138 discipline applied to ranking: a plain
    * `row_number over (partition by nation)` on the per-part aggregate
    * sorts every part of a nation in one task — with a bounded group
    * key over a scaling part vocabulary that is the q116 straggler in
    * top-k clothing. Phase-1 partitions are (bounded group) x (hash
    * bucket), phase-2 input is 3·nBuckets summary rows per group.
    * Ranking key (rev_e4 DESC, part) is an exact-BIGINT total order, so
    * both phases and the oracle's one-window form pick identical
    * rows. */
  def q170TopkTwoPhase(s: SparkSession, dir: String): DataFrame = {
    val nBuckets = 32
    val rev = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("l_partkey").as("part"),
        (expr("cast(round(l_extendedprice * 100) as bigint)") *
         (lit(100L) - expr("cast(round(l_discount * 100) as bigint)")))
          .as("rev_e4"))
      .groupBy("nation", "part").agg(sum("rev_e4").as("rev_e4"))
      .withColumn("bucket", pmod(hash(col("part")), lit(nBuckets)))
    val w1 = Window.partitionBy("nation", "bucket")
      .orderBy(desc("rev_e4"), asc("part"))
    val survivors = rev.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= 3)
    val w2 = Window.partitionBy("nation").orderBy(desc("rev_e4"), asc("part"))
    survivors.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= 3)
      .select(col("nation"), col("rank").cast("int").as("rank"),
        col("part").cast("bigint").as("part"),
        col("rev_e4").cast("bigint").as("rev_e4"))
      .orderBy("nation", "rank")
  }

  /** Test-only single-window baseline for SegmentationSpec: the shape
    * q170 exists to avoid (per-group global sort). */
  private[graft] def topkNaive(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("l_partkey").as("part"),
        (expr("cast(round(l_extendedprice * 100) as bigint)") *
         (lit(100L) - expr("cast(round(l_discount * 100) as bigint)")))
          .as("rev_e4"))
      .groupBy("nation", "part").agg(sum("rev_e4").as("rev_e4"))
    rev.withColumn("rank", row_number().over(
        Window.partitionBy("nation").orderBy(desc("rev_e4"), asc("part"))))
      .filter(col("rank") <= 3)
      .select(col("nation"), col("rank").cast("int").as("rank"),
        col("part").cast("bigint").as("part"),
        col("rev_e4").cast("bigint").as("rev_e4"))
      .orderBy("nation", "rank")
  }

  // ---------------------------------------------------------------- q171

  /** Month-over-month growth report — monthly revenue per region with
    * absolute and e6-quantized relative deltas via lag over MONTH
    * SUMMARIES (bounded rows: |regions| x |months|). The reference's
    * dashboard time-series (`README.md:29-35`) with its derivative. The
    * pct chain — CAST(delta)/CAST(prev) with terminal floor — is
    * mirrored; revenue is exact e4-unit BIGINT. */
  def q171MomGrowth(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region"),
        date_trunc("month", col("l_shipdate")).cast("date").as("m"),
        (expr("cast(round(l_extendedprice * 100) as bigint)") *
         (lit(100L) - expr("cast(round(l_discount * 100) as bigint)")))
          .as("rev_e4"))
      .groupBy("region", "m").agg(sum("rev_e4").as("rev_e4"))
    val w = Window.partitionBy("region").orderBy("m")
    monthly.withColumn("prev", lag("rev_e4", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("region"), col("m"),
        col("rev_e4").cast("bigint").as("rev_e4"),
        (col("rev_e4") - col("prev")).cast("bigint").as("delta_e4"),
        floor((col("rev_e4") - col("prev")).cast("double") /
            col("prev").cast("double") * lit(1000000.0))
          .cast("bigint").as("growth_e6"))
      .orderBy("region", "m")
  }

  // ---------------------------------------------------------------- q174

  /** Two-sample KOLMOGOROV–SMIRNOV drift statistic between the click
    * and view value distributions — D = max |F₁(v) − F₂(v)| — the
    * distribution-shift detector a training-data pipeline runs between
    * crawls/sources before q69's mixture math trusts them. Exactness:
    * both empirical CDFs ride cumulative INTEGER counts per distinct
    * value, and the sup is taken over the cross-multiplied BIGINT
    * |cum₁·n₂ − cum₂·n₁| (no double enters the argmax), with the
    * attaining value tie-broken to the smallest. Only the final
    * reported D divides, once.
    *
    * Scale (the q116/q138 two-phase discipline — `value` is a
    * CONTINUOUS double, so per-value "summaries" approach corpus size
    * and must never feed an unpartitioned window): values quantize to
    * a 1024-cell bucket grid derived from the data's own min/max (one
    * bounded scalar pass, the q19 mirror class; no hard-coded domain).
    * Cumulative-count OFFSETS come from a window over ≤1024 bucket
    * summaries; the per-distinct-value CDF then rides an intra-bucket
    * window PARTITIONED by bucket (off + intra cumsum). The bucket map
    * is monotone in value, so bucket-then-value order IS value order
    * and every cumulative count — hence D and its attaining value — is
    * bit-identical to the single-window form (KsEquivalenceSpec); the
    * sup itself is one map-side-combinable max(struct) aggregate,
    * argmin-of-ties encoded as max(dnum, −value). */
  def q174KsDrift(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "view"))
      .select(col("value"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("i1"),
        when(col("event_type") === "view", 1L).otherwise(0L).as("i2"))
    // grid bounds + sample sizes in one bounded scalar pass
    val g = ev.agg(min(expr("cast(round(value * 1000000) as bigint)")).as("lo"),
        max(expr("cast(round(value * 1000000) as bigint)")).as("hi"),
        sum("i1").as("n1"), sum("i2").as("n2")).head()
    require(!g.isNullAt(0), "q174: no click/view events in the corpus")
    val (lo, span) = (g.getLong(0), math.max(1L, g.getLong(1) - g.getLong(0) + 1))
    val (n1, n2) = (g.getLong(2), g.getLong(3))
    val counts = ev
      .withColumn("vb", expr(
        s"(cast(round(value * 1000000) as bigint) - ${lo}L) * 1024L div ${span}L"))
      .groupBy("vb", "value")
      .agg(sum("i1").as("c1"), sum("i2").as("c2"))
    val wOff = Window.orderBy("vb").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.groupBy("vb")
      .agg(sum("c1").as("b1"), sum("c2").as("b2"))
      .withColumn("off1", coalesce(sum("b1").over(wOff), lit(0L)))
      .withColumn("off2", coalesce(sum("b2").over(wOff), lit(0L)))
      .select("vb", "off1", "off2")
    val wIntra = Window.partitionBy("vb").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, 0)
    counts.join(broadcast(offsets), Seq("vb"))
      .withColumn("cum1", col("off1") + sum("c1").over(wIntra))
      .withColumn("cum2", col("off2") + sum("c2").over(wIntra))
      .withColumn("dnum",
        abs(col("cum1") * lit(n2) - col("cum2") * lit(n1)))
      .agg(max(struct(col("dnum"), (-col("value")).as("nv"))).as("m"))
      .select(lit(n1).cast("bigint").as("n_click"),
        lit(n2).cast("bigint").as("n_view"),
        col("m.dnum").cast("bigint").as("d_num"),
        (col("m.dnum").cast("double") / lit(n1 * n2).cast("double")).as("ks"),
        (-col("m.nv")).as("at_value"))
  }

  /** Round-9's registered q174 shape, kept TEST-ONLY as the straggler
    * guard's negative control and the equivalence baseline: the
    * `groupBy(value)` "summary" is corpus-sized for a continuous value
    * column, and both the cumulative window and the n/dmax windows have
    * an EMPTY partition spec — the whole CDF sorts in one task at 100×.
    * KsEquivalenceSpec proves the two-phase registration bit-identical;
    * StragglerGuardSpec must keep flagging this form. */
  private[graft] def ksDriftNaive(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "view"))
      .groupBy("value")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("c2"))
    val wCum = Window.orderBy("value")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cdf = counts
      .withColumn("cum1", sum("c1").over(wCum))
      .withColumn("cum2", sum("c2").over(wCum))
      .withColumn("n1", sum("c1").over(Window.partitionBy()))
      .withColumn("n2", sum("c2").over(Window.partitionBy()))
      .withColumn("dnum", abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
    cdf.withColumn("dmax", max("dnum").over(Window.partitionBy()))
      .agg(first(col("n1")).as("na"), first(col("n2")).as("nb"),
        first(col("dmax")).as("d_num"),
        min(when(col("dnum") === col("dmax"), col("value"))).as("at_value"))
      .select(col("na").cast("bigint").as("n_click"),
        col("nb").cast("bigint").as("n_view"),
        col("d_num").cast("bigint").as("d_num"),
        (col("d_num").cast("double") /
          (col("na") * col("nb")).cast("double")).as("ks"),
        col("at_value"))
  }

  // ---------------------------------------------------------------- q182

  /** SCORE CALIBRATION + CUMULATIVE GAINS by decile — the model-eval
    * readout for q175's decay score: users rank by score, split into
    * deciles, and each decile reports its conversion rate (does the
    * score order actual purchasers first?) plus the cumulative share
    * of all conversions captured — the lift/gains curve a targeting
    * decision reads.
    *
    * The global rank is the q116/q166 two-phase form (score-bucket
    * counts, offsets over bucket summaries, intra-bucket row_number),
    * taken ASCENDING and reflected (rank_desc = n + 1 − rank_asc):
    * negative bucket keys are deliberately avoided because integer
    * division semantics diverge on negatives (Spark `div` truncates
    * toward zero, DuckDB `//` floors) — a documented dialect edge. The
    * reflection makes the effective order (score DESC, user DESC),
    * which the oracle mirrors verbatim. Deciles, conversion counts,
    * and cumulative captures are exact integers; the two ratios are
    * mirrored single divisions over a 10-row summary frame. */
  def q182ScoreCalibration(s: SparkSession, dir: String): DataFrame = {
    val anchorUs = Tables.events(s, dir)
      .agg(max(expr("unix_micros(ts)"))).head().getLong(0)
    val scored = Tables.events(s, dir)
      .withColumn("k",
        expr(s"least((${anchorUs}L - unix_micros(ts)) div 604800000000L, 20L)"))
      .groupBy("user_id")
      .agg(sum(expr("cast(round(value * 100) as bigint)") *
          expr("shiftright(1000000L, cast(k as int))")).as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
      .withColumn("vb", expr("score div 1000000000"))
    val wOff = Window.orderBy("vb").rowsBetween(Window.unboundedPreceding, -1)
    // the user total and the conversion total used to be two separate
    // driver actions (scored.count() + a deciles aggregate), each paying
    // a full recompute of its upstream chain as its own job — both are
    // sums over BOUNDED summary frames (bucket counts / the 10-row
    // decile frame), so they ride those frames as single-partition
    // windows instead (the q174/q116 bounded-summary window class):
    // one action total, no upstream recompute
    val offsets = scored.groupBy("vb").agg(count(lit(1)).as("bc"))
      .withColumn("off", coalesce(sum("bc").over(wOff), lit(0L)))
      .withColumn("total", sum("bc").over(Window.partitionBy()))
      .select("vb", "off", "total")
    val wIntra = Window.partitionBy("vb").orderBy("score", "user_id")
    val ranked = scored.join(broadcast(offsets), Seq("vb"))
      .withColumn("rank_desc",
        col("total") + 1L - (col("off") + row_number().over(wIntra)))
      .withColumn("decile",
        expr("((rank_desc - 1) * 10) div total + 1"))
    val deciles = ranked.groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum("converted").as("n_conv"))
    deciles
      .withColumn("cum_conv", sum("n_conv").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("total_conv", sum("n_conv").over(Window.partitionBy()))
      .select(col("decile").cast("int").as("decile"),
        col("n_users").cast("bigint").as("n_users"),
        col("n_conv").cast("bigint").as("n_conv"),
        (col("n_conv").cast("double") / col("n_users").cast("double"))
          .as("conversion_rate"),
        col("cum_conv").cast("bigint").as("cum_conv"),
        (col("cum_conv").cast("double") / col("total_conv").cast("double"))
          .as("cum_capture"))
      .orderBy("decile")
  }

  // ---------------------------------------------------------------- q183

  /** SKYLINE (Pareto front) — customers not dominated on (lifetime
    * spend MAX, recency MIN): the multi-criteria "best tradeoffs"
    * operator (Börzsönyi et al.'s skyline), here the "valuable AND
    * active" account list no single score can rank. p dominates q iff
    * p is >= on every dimension-goal and strictly better on one;
    * identical points do not dominate each other, so duplicates
    * survive together (deterministic set semantics).
    *
    * Scale shape — grid pruning before any pairwise work: per
    * spend-bucket minima of recency collapse to bucket SUMMARIES, and
    * a suffix-min window over the DESC bucket order yields, for each
    * bucket, the best recency achieved by any STRICTLY-richer bucket —
    * any point at least that stale is dominated by construction and
    * never reaches the exact pass. Only the surviving candidates (the
    * skyline plus same-bucket borderline points — output-sized, not
    * input-sized) pay the exact dominance anti-join. At 100 TB the
    * grid refines (more buckets → tighter pruning) with the same two
    * summary passes. */
  def q183Skyline(s: SparkSession, dir: String): DataFrame = {
    val pc = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("m"),
        datediff(
          lit(Tables.orders(s, dir)
            .agg(max(col("o_orderdate").cast("date"))).head().getDate(0)),
          max(col("o_orderdate").cast("date"))).cast("bigint").as("r"))
      .withColumn("b", expr("m div 1000000"))
    val sufMin = pc.groupBy("b").agg(min("r").as("bmin"))
      .withColumn("suf", min("bmin").over(
        Window.orderBy(desc("b")).rowsBetween(Window.unboundedPreceding, -1)))
      .select("b", "suf")
    val cands = pc.join(sufMin, Seq("b"))
      .filter(col("suf").isNull || col("r") < col("suf"))
      .select("ck", "m", "r")
    val other = cands.select(col("ck").as("ck2"), col("m").as("m2"),
      col("r").as("r2"))
    cands.join(other,
        col("m2") >= col("m") && col("r2") <= col("r") &&
          (col("m2") > col("m") || col("r2") < col("r")),
        "left_anti")
      .select(col("ck").cast("bigint").as("ck"),
        col("m").cast("bigint").as("spend_cents"),
        col("r").cast("bigint").as("recency_days"))
      .orderBy("ck")
  }

  // ---------------------------------------------------------------- q184

  /** EXACT multi-quantile per group in ONE two-phase pass — the scale
    * path q49's own scaladoc names as missing: `percentile()` buffers
    * every group value in one aggregation state and q51's GK sketch
    * trades exactness for mergeable state, while this computes the
    * exact p50/p90/p99 order statistics per event type with bounded
    * state everywhere. The latency-SLO readout (p50/p90/p99) is THE
    * production shape for this operator.
    *
    * The q138/q180 selection discipline, generalized to k ranks per
    * group in one pass: cent-quantized values bucket by `v div 100`;
    * per-(group, bucket) counts feed a rank-offset window over bucket
    * SUMMARIES (partitioned by group — never scan rows); each target
    * rank r_p = (p·(n−1)) div 100 + 1 lands in exactly one bucket
    * (off < r ≤ off+bc); only target buckets rejoin the rows, where a
    * (group, bucket, p)-partitioned row_number under the TOTAL
    * (v, event_id) order selects the exact order statistic. All ranks
    * ride the same summary frame — k quantiles cost one extra
    * broadcast, not k passes. Values are BIGINT cents end to end; the
    * oracle re-derives the identical ranks with one per-group
    * row_number (a group sort is fine in the oracle engine). */
  def q184GroupQuantiles(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir)
      .select(col("event_type").as("g"),
        expr("cast(round(value * 100) as bigint)").as("v"),
        col("event_id").as("ei"))
      .withColumn("vb", expr("v div 100"))
    val wOff = Window.partitionBy("g").orderBy("vb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val summaries = base.groupBy("g", "vb").agg(count(lit(1)).as("bc"))
      .withColumn("off", coalesce(sum("bc").over(wOff), lit(0L)))
      .withColumn("n", sum("bc").over(Window.partitionBy("g")))
    val targets = summaries
      .select(col("g"), col("vb"), col("off"), col("n"),
        explode(expr("array(50L, 90L, 99L)")).as("p"))
      .withColumn("r", expr("(p * (n - 1)) div 100 + 1"))
      .filter(col("off") < col("r") && col("r") <= col("off") + col("bc"))
      .select("g", "vb", "off", "n", "p", "r")
    val wIntra = Window.partitionBy("g", "vb", "p").orderBy("v", "ei")
    base.join(broadcast(targets), Seq("g", "vb"))
      .withColumn("rn", col("off") + row_number().over(wIntra))
      .filter(col("rn") === col("r"))
      .groupBy("g")
      .agg(first("n").as("n"),
        min(when(col("p") === 50, col("v"))).as("p50"),
        min(when(col("p") === 90, col("v"))).as("p90"),
        min(when(col("p") === 99, col("v"))).as("p99"))
      .select(col("g").as("event_type"), col("n").cast("bigint").as("n_events"),
        col("p50").cast("bigint").as("p50_cents"),
        col("p90").cast("bigint").as("p90_cents"),
        col("p99").cast("bigint").as("p99_cents"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q185

  /** EXACT ROC AUC of the q175 decay score predicting NEXT-DAY
    * conversion — the discrimination half of the model-eval readout
    * whose calibration half is q182, run as a proper leakage-free
    * backtest: the score sums only events STRICTLY OLDER than the
    * corpus's final day (ages rebased to the cutoff), and the label is
    * "purchased within that final day". AUC is the tie-averaged
    * Mann–Whitney statistic: U = Σ_pos Σ_neg ([s_p > s_n] +
    * ½[s_p = s_n]), evaluated WITHOUT pair enumeration by grouping per
    * distinct score — 2U = Σ_scores pos_s · (2·cum_neg_below + neg_s)
    * — so every term is BIGINT-exact (the ½ rides as the doubled
    * statistic) and the one division at the end is mirrored.
    *
    * Scale: the score is an unbounded BIGINT key, so cum_neg_below
    * follows the q174/q116 two-phase discipline — score-bucket counts,
    * offsets from a window over ≤|buckets| summaries, intra-bucket
    * cumulative sums partitioned by bucket — never an unpartitioned
    * window over the per-score frame (StragglerGuardSpec sweeps this
    * plan like every registration). One entity shuffle (per-user
    * score+label in a single pass), one bucket shuffle, one bounded
    * aggregate. */
  def q185Auc(s: SparkSession, dir: String): DataFrame = {
    val anchorUs = Tables.events(s, dir)
      .agg(max(expr("unix_micros(ts)"))).head().getLong(0)
    val cutoffUs = anchorUs - 86400000000L
    val scored = Tables.events(s, dir)
      .withColumn("k",
        expr(s"least((${cutoffUs}L - unix_micros(ts)) div 604800000000L, 20L)"))
      .groupBy("user_id")
      .agg(sum(when(expr(s"unix_micros(ts) <= ${cutoffUs}L"),
            expr("cast(round(value * 100) as bigint)") *
              expr("shiftright(1000000L, cast(k as int))"))
          .otherwise(0L)).as("score"),
        max(when(col("event_type") === "purchase" &&
            expr(s"unix_micros(ts) > ${cutoffUs}L"), 1L).otherwise(0L))
          .as("conv"))
      .withColumn("vb", expr("score div 1000000000"))
    val perScore = scored.groupBy("vb", "score")
      .agg(sum("conv").as("pos_s"), sum(lit(1L) - col("conv")).as("neg_s"))
    val wOff = Window.orderBy("vb").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perScore.groupBy("vb").agg(sum("neg_s").as("bneg"))
      .withColumn("offneg", coalesce(sum("bneg").over(wOff), lit(0L)))
      .select("vb", "offneg")
    val wIntra = Window.partitionBy("vb").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, 0)
    perScore.join(broadcast(offsets), Seq("vb"))
      .withColumn("cumneg_below",
        col("offneg") + sum("neg_s").over(wIntra) - col("neg_s"))
      .agg(sum("pos_s").as("np"), sum("neg_s").as("nn"),
        sum(col("pos_s") * (lit(2L) * col("cumneg_below") + col("neg_s")))
          .as("u2"))
      .select(col("np").cast("bigint").as("n_pos"),
        col("nn").cast("bigint").as("n_neg"),
        col("u2").cast("bigint").as("u_doubled"),
        (col("u2").cast("double") /
          (lit(2L) * col("np") * col("nn")).cast("double")).as("auc"))
  }

  // ---------------------------------------------------------------- q187

  /** Doubled tie-averaged ranks of a value column — 2·avgrank(v) =
    * 2·|{values < v}| + ties(v) + 1, an INTEGER for every v — via the
    * two-phase bucket discipline (offsets over bucket summaries,
    * intra-bucket cumulative counts; `bucket` must be a monotone
    * floor-scale of v). Returns one (v, r2) row per distinct value. */
  private def doubledRanks(vals: DataFrame, bucket: Column): DataFrame = {
    val base = vals.select(col("v"), bucket.as("vb"))
    val perV = base.groupBy("vb", "v").agg(count(lit(1)).as("cnt"))
    val wOff = Window.orderBy("vb").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perV.groupBy("vb").agg(sum("cnt").as("bc"))
      .withColumn("off", coalesce(sum("bc").over(wOff), lit(0L)))
      .select("vb", "off")
    val wIntra = Window.partitionBy("vb").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    perV.join(broadcast(offsets), Seq("vb"))
      .withColumn("below", col("off") + sum("cnt").over(wIntra) - col("cnt"))
      .select(col("v"), (lit(2L) * col("below") + col("cnt") + lit(1L)).as("r2"))
  }

  /** SPEARMAN rank correlation between per-user activity (event count)
    * and per-user spend (exact cents) — the monotone-association
    * readout that shrugs off the heavy tails which bend q181's Pearson:
    * ρ is Pearson over tie-averaged ranks, and every rank here is the
    * exact integer DOUBLED rank (2·avgrank — the ½ of a tie-average
    * rides as the factor of two), so all six moments are BIGINT sums
    * and the one assembled double chain is q181's, floor-quantized
    * to e6 (scale-invariant under the doubling).
    *
    * Scale: global ranking never sorts the user frame in one task —
    * both rank maps follow the q116/q174 two-phase bucket discipline,
    * then join back on the VALUE key (a scaling key), and the moments
    * are one map-side-combinable aggregate. Headroom: ranks are
    * ≤ 2n+1, so a BIGINT product wraps past n ≈ 1.3M users — the
    * cross/square products therefore cast to decimal(38,0) BEFORE the
    * sum (round 11: the doc claimed this widening but the code summed
    * LongType, silently wrong at scale in non-ANSI mode), keeping the
    * moments exact to ~1e9 users with the identical plan shape; the
    * oracle's HUGEINT sums are exact the same way. */
  def q187Spearman(s: SparkSession, dir: String): DataFrame = {
    val u = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("x"),
        sum(expr("cast(round(value * 100) as bigint)")).as("y"))
    val rx = doubledRanks(u.select(col("x").as("v")), expr("v div 16"))
      .select(col("v").as("x"), col("r2").as("rx"))
    val ry = doubledRanks(u.select(col("y").as("v")), expr("v div 100000"))
      .select(col("v").as("y"), col("r2").as("ry"))
    u.join(rx, Seq("x")).join(ry, Seq("y"))
      .agg(count(lit(1)).as("n"), sum("rx").as("sx"), sum("ry").as("sy"),
        sum(col("rx").cast("decimal(19,0)") * col("ry")).as("sxy"),
        sum(col("rx").cast("decimal(19,0)") * col("rx")).as("sxx"),
        sum(col("ry").cast("decimal(19,0)") * col("ry")).as("syy"))
      .select(col("n").cast("bigint").as("n_users"),
        floor(
          (col("n") * col("sxy") -
            col("sx").cast("decimal(19,0)") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") -
              col("sx").cast("decimal(19,0)") * col("sx")).cast("double") *
                 (col("n") * col("syy") -
              col("sy").cast("decimal(19,0)") * col("sy")).cast("double")) *
            lit(1000000.0))
          .cast("bigint").as("rho_e6"))
  }

  // ---------------------------------------------------------------- q190

  /** TOP-K PER GROUP via the native bounded-state aggregate — the
    * third point in the library's top-k design space and the one a
    * 100 TB pipeline reaches for when k is small: the window
    * row_number form sorts every group row after a full shuffle;
    * q170's two-phase pigeonhole is lossless with two window passes;
    * `graft_topk` (functions/Topk.scala, a TypedImperativeAggregate)
    * keeps a bounded k-pair TreeSet per group, partial-aggregates
    * MAP-SIDE, and ships exactly |groups|·k fixed-width pairs through
    * the exchange — no per-group sort ever materializes. Top-5 events
    * by cent value per event type; descending order is the negated
    * key (exact for bigint), ties break on event_id ascending, and
    * TopkSpec proves the aggregate invariant under repartitioning and
    * bit-equal to the window form. */
  def q190NativeTopk(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("vc"),
        col("event_id"))
      .groupBy("event_type")
      .agg(expr("graft_topk(-vc, event_id, 5)").as("tk"))
      .select(col("event_type"), posexplode(col("tk")))
      .select(col("event_type"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.v").cast("bigint").as("event_id"),
        (-col("col.k")).cast("bigint").as("v_cents"))
      .orderBy("event_type", "rank")

  // ---------------------------------------------------------------- q192

  /** IQR (Tukey-fence) OUTLIER GATE per event type — the third member
    * of the outlier family next to q70's moment z-score and q152's
    * MAD: flag values outside [p25 − 1.5·IQR, p75 + 1.5·IQR], with the
    * fences kept EXACT by clearing the halves — 2v < 5·p25 − 3·p75
    * and 2v > 5·p75 − 3·p25 are the fence tests on the integer
    * lattice, so no 1.5 ever becomes a double and the gate is
    * bit-identical across engines. Quartiles come from the q184
    * two-phase selection (rank (p·(n−1)) div 100 + 1 under the total
    * (v, event_id) order); the 5-row fence frame broadcasts back over
    * one more scan. Output: per-type totals, low/high outlier counts,
    * and the e6-floored outlier share (one mirrored division). */
  def q192IqrOutliers(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir)
      .select(col("event_type").as("g"),
        expr("cast(round(value * 100) as bigint)").as("v"),
        col("event_id").as("ei"))
      .withColumn("vb", expr("v div 100"))
    val wOff = Window.partitionBy("g").orderBy("vb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val summaries = base.groupBy("g", "vb").agg(count(lit(1)).as("bc"))
      .withColumn("off", coalesce(sum("bc").over(wOff), lit(0L)))
      .withColumn("n", sum("bc").over(Window.partitionBy("g")))
    val targets = summaries
      .select(col("g"), col("vb"), col("off"), col("n"), col("bc"),
        explode(expr("array(25L, 75L)")).as("p"))
      .withColumn("r", expr("(p * (n - 1)) div 100 + 1"))
      .filter(col("off") < col("r") && col("r") <= col("off") + col("bc"))
      .select("g", "vb", "off", "p", "r")
    val wIntra = Window.partitionBy("g", "vb", "p").orderBy("v", "ei")
    val quartiles = base.join(broadcast(targets), Seq("g", "vb"))
      .withColumn("rn", col("off") + row_number().over(wIntra))
      .filter(col("rn") === col("r"))
      .groupBy("g")
      .agg(min(when(col("p") === 25, col("v"))).as("q1"),
        min(when(col("p") === 75, col("v"))).as("q3"))
      .select(col("g"), (lit(5L) * col("q1") - lit(3L) * col("q3")).as("lo2"),
        (lit(5L) * col("q3") - lit(3L) * col("q1")).as("hi2"))
    base.join(broadcast(quartiles), Seq("g"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(when(lit(2L) * col("v") < col("lo2"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(lit(2L) * col("v") > col("hi2"), 1L).otherwise(0L)).as("n_hi"))
      .select(col("g").as("event_type"), col("n").cast("bigint").as("n_events"),
        col("n_lo").cast("bigint").as("n_low_outliers"),
        col("n_hi").cast("bigint").as("n_high_outliers"),
        floor((col("n_lo") + col("n_hi")).cast("double") /
          col("n").cast("double") * lit(1000000.0))
          .cast("bigint").as("outlier_share_e6"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q193

  /** CUSUM CHANGE-POINT detection over daily volumes per event type —
    * "did this stream's level shift, and when": the day maximizing the
    * scaled cumulative deviation |m·C_i − i·T| (C_i = cumulative count
    * through day i of m observed days, T = total), which is the
    * classic CUSUM statistic with the mean cleared of division —
    * every comparison is BIGINT-exact and the argmax cannot be
    * perturbed by float rounding. The reported magnitude divides once
    * (mirrored) to the e6-floored normalized deviation.
    *
    * Scale: the scan collapses to per-(type, day) counts FIRST; all
    * windows (day index, cumulative, per-type max) ride the ~|days| ×
    * |types| summary frame partitioned by the enum over an aggregate —
    * the legal straggler-guard shape, q148's discipline. Earliest-day
    * tie-break via min over the attaining days. */
  def q193Changepoint(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy("event_type").orderBy("d")
    val wAll = Window.partitionBy("event_type")
    val dev = daily
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("ci", sum("c").over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("t", sum("c").over(wAll))
      .withColumn("dev", abs(col("m") * col("ci") - col("i") * col("t")))
    dev.withColumn("dmax", max("dev").over(wAll))
      .groupBy("event_type")
      .agg(first("m").as("m"), first("t").as("t"), first("dmax").as("dmax"),
        min(when(col("dev") === col("dmax"), col("d"))).as("cp_day"))
      .select(col("event_type"), col("m").cast("bigint").as("n_days"),
        col("t").cast("bigint").as("n_events"), col("cp_day"),
        col("dmax").cast("bigint").as("dev_num"),
        floor(col("dmax").cast("double") /
          (col("m") * col("t")).cast("double") * lit(1000000.0))
          .cast("bigint").as("dev_e6"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q200

  /** CUPED variance-reduced A/B readout — q162's Welch test upgraded
    * with the industry-standard pre-period covariate adjustment
    * (Deng et al., WSDM'13): y_adj = y − θ·(x − x̄) with θ =
    * cov(x, y)/var(x) over the pooled population, where y is each
    * user's purchase spend in the final 14 days and x their spend
    * before it. The arm means of the adjusted metric collapse to pure
    * moment arithmetic — mean_adj = ȳ_arm − θ·(x̄_arm − x̄) — so NO
    * per-user adjusted row ever materializes: one entity aggregate,
    * one bounded arm aggregate, one global moment aggregate. Arms are
    * q162's identical salted-hash split.
    *
    * Determinism: all sums are exact BIGINT cents; every assembled
    * statistic (θ, ρ², adjusted means) is one fixed-order double
    * chain over those sums — cross-products of corpus-scale sums take
    * each operand to double FIRST (the q188 rule), so nothing can
    * overflow at any scale. ρ²_e6 reports the variance fraction CUPED
    * removes — the "was the covariate worth it" readout. */
  def q200CupedAb(s: SparkSession, dir: String): DataFrame = {
    val anchorUs = Tables.events(s, dir)
      .agg(max(expr("unix_micros(ts)"))).head().getLong(0)
    val cutUs = anchorUs - 14L * 86400000000L
    val perUser = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase" &&
            expr(s"unix_micros(ts) <= ${cutUs}L"),
          expr("cast(round(value * 100) as bigint)")).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase" &&
            expr(s"unix_micros(ts) > ${cutUs}L"),
          expr("cast(round(value * 100) as bigint)")).otherwise(0L)).as("y"))
      .withColumn("arm",
        when(expr("substring(md5(concat('ab1_', cast(user_id as string))), 1, 1)")
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), "A").otherwise("B"))
    val g = perUser.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
    val arms = perUser.groupBy("arm")
      .agg(count(lit(1)).as("an"), sum("x").as("asx"), sum("y").as("asy"))
    val a = arms.filter(col("arm") === "A")
      .select(col("an").as("na"), col("asx").as("sxa"), col("asy").as("sya"))
    val b = arms.filter(col("arm") === "B")
      .select(col("an").as("nb"), col("asx").as("sxb"), col("asy").as("syb"))
    a.crossJoin(b).crossJoin(g)
      .withColumn("theta",
        (col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
        (col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")))
      .withColumn("xbar", col("sx").cast("double") / col("n").cast("double"))
      .withColumn("adj_a",
        col("sya").cast("double") / col("na").cast("double") -
          col("theta") * (col("sxa").cast("double") / col("na").cast("double") -
            col("xbar")))
      .withColumn("adj_b",
        col("syb").cast("double") / col("nb").cast("double") -
          col("theta") * (col("sxb").cast("double") / col("nb").cast("double") -
            col("xbar")))
      .withColumn("cnum",
        col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double"))
      .withColumn("rho2",
        col("cnum") * col("cnum") /
          ((col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) *
           (col("n").cast("double") * col("syy").cast("double") -
            col("sy").cast("double") * col("sy").cast("double"))))
      .select(col("na").cast("bigint").as("n_a"),
        col("nb").cast("bigint").as("n_b"),
        floor(col("theta") * lit(1000000.0)).cast("bigint").as("theta_e6"),
        (col("adj_a") / lit(100.0)).as("mean_adj_a"),
        (col("adj_b") / lit(100.0)).as("mean_adj_b"),
        ((col("adj_a") - col("adj_b")) / lit(100.0)).as("adj_lift"),
        floor(col("rho2") * lit(1000000.0)).cast("bigint").as("rho2_e6"))
  }

  // ---------------------------------------------------------------- q248

  /** q248 — NATIVE HISTOGRAM quantiles: per event type, one
    * `graft_hist` aggregate (functions/Hist.scala) carries the whole
    * 512-bin value histogram as a single fixed-width buffer, and the
    * p50/p95 rank selection then runs ROW-LOCALLY over the bounded
    * array — a single shuffle of |types| × 4 KB buffers, zero windows,
    * zero second pass. The bounded-state ladder's third rung next to
    * `graft_kmv` (distincts) and `graft_topk` (ranking): where the
    * two-phase bucket form (q100/q184) shuffles one row per (group,
    * touched bin) and selects through window offsets, the sketch form
    * ships ONE buffer per group and selects with a fold — and, being
    * element-wise-mergeable, per-shard histograms (per-day → per-month)
    * union without re-reading data.
    *
    * Determinism: integer counters under element-wise merge are
    * order/partition/merge invariant; selection is the exact smallest-
    * bin-with-2·cum≥n rule (ceil-rank without division, q247's), so
    * the DuckDB twin (per-bin GROUP BY + the same selection)
    * hash-matches. The quantile is the bin's lower edge — resolution =
    * grid step, q100's documented approximation contract.
    *
    * The selection fold is a higher-order `aggregate` (CodegenFallback,
    * the documented HOF caveat) — legal here because it evaluates over
    * |event types| ROWS, never the corpus: the codegen'd hot path is
    * the scan projection + the native aggregate. */
  def q248NativeHistogram(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .select(col("event_type"),
        expr("least(511L, greatest(0L, cast(floor(value) as bigint)))").as("bin"))
      .groupBy("event_type")
      .agg(expr("graft_hist(bin, 512)").as("h"),
        count(lit(1)).cast("bigint").as("n_events"))
      .select(col("event_type"), col("n_events"),
        expr("""aggregate(h,
          named_struct('i', 0L, 'cum', 0L, 'p50', -1L, 'p95', -1L),
          (acc, x) -> named_struct(
            'i', acc.i + 1,
            'cum', acc.cum + x,
            'p50', case when acc.p50 = -1L and 2 * (acc.cum + x) >= n_events
              then acc.i else acc.p50 end,
            'p95', case when acc.p95 = -1L and 20 * (acc.cum + x) >= 19 * n_events
              then acc.i else acc.p95 end),
          acc -> acc)""").as("sel"))
      .select(col("event_type"), col("n_events"),
        col("sel.p50").cast("bigint").as("p50_bin"),
        col("sel.p95").cast("bigint").as("p95_bin"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q261

  /** q261 — HISTOGRAM SKETCH ROLLUP: per-day `graft_hist` sketches land
    * in a parquet sketch store (one 512-long array per day), and the
    * GLOBAL p50/p95/p99 then computes from the stored sketches ALONE —
    * element-wise sums over (day × bin) summary rows, never a second
    * event scan. The q203/q117 mergeable-sketch economics applied to
    * distributions: at 100 TB the raw table is scanned once per
    * ingest day ever; every later question (global quantiles, any
    * month's, any day-range's) is arithmetic over |days| × 4 KB
    * buffers. Exactly why `graft_hist`'s merge is element-wise
    * addition (HistSpec proves merge-path invariance — which is the
    * statement that the rollup sum IS the direct aggregation).
    *
    * Scale shape: one event scan (the daily sketch build, map-side
    * partial aggregation), one bounded posexplode over |days|·512
    * summary rows, one bin-keyed sum, rank selection over 512 rows.
    * All integers; same ceil-rank rule as q247/q248. */
  def q261HistRollup(s: SparkSession, dir: String): DataFrame = {
    val store = graft.Staging.fresh("histstore")
    Tables.events(s, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        expr("least(511L, greatest(0L, cast(floor(value) as bigint)))").as("bin"))
      .groupBy("day")
      .agg(expr("graft_hist(bin, 512)").as("h"),
        count(lit(1)).cast("bigint").as("n"))
      .write.mode("overwrite").parquet(store)
    val daily = s.read.parquet(store)
    // element-wise rollup: (pos, cnt) summary rows → ONE merged array
    // row, then the q248 row-local fold — windowless by construction
    // (the straggler sweep flagged the first cut's unpartitioned
    // cumulative window over these rows; 512 bounded rows make the
    // collect_list assembly trivially safe)
    daily.select(posexplode(col("h")))
      .groupBy("pos").agg(sum("col").cast("bigint").as("cnt"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, cnt))), " +
        "x -> x.cnt)").as("h"))
      .crossJoin(broadcast(daily.agg(
        count(lit(1)).cast("bigint").as("n_days"),
        sum("n").cast("bigint").as("n_events"))))
      .select(col("n_days"), col("n_events"),
        expr("""aggregate(h,
          named_struct('i', 0L, 'cum', 0L, 'p50', -1L, 'p95', -1L, 'p99', -1L),
          (acc, x) -> named_struct(
            'i', acc.i + 1,
            'cum', acc.cum + x,
            'p50', case when acc.p50 = -1L and 2 * (acc.cum + x) >= n_events
              then acc.i else acc.p50 end,
            'p95', case when acc.p95 = -1L and 20 * (acc.cum + x) >= 19 * n_events
              then acc.i else acc.p95 end,
            'p99', case when acc.p99 = -1L and 100 * (acc.cum + x) >= 99 * n_events
              then acc.i else acc.p99 end),
          acc -> acc)""").as("sel"))
      .select(col("n_days"), col("n_events"),
        col("sel.p50").cast("bigint").as("p50_bin"),
        col("sel.p95").cast("bigint").as("p95_bin"),
        col("sel.p99").cast("bigint").as("p99_bin"))
  }

  // ------------------------------------------------------------ registry

  /** Exact FLOOR division on the integer lattice: Spark's `div` truncates
    * toward zero while DuckDB's `//` floors, so the two diverge exactly
    * when the dividend is negative and the division is inexact. All
    * callers pass a positive divisor; this closes the sign hole without
    * leaning on a non-negative-fixture premise. */
  private def floorDiv(num: String, den: String): Column = expr(
    s"case when ($num) < 0 and ($num) % ($den) != 0 " +
      s"then ($num) div ($den) - 1 else ($num) div ($den) end")

  /** q272 — TRIMMED MEAN per event type (10% two-sided trim), the missing
    * member of the robust-aggregation family next to q138/q167 medians,
    * q152 MAD, and q192 Tukey fences: drop the t = n div 10 smallest and
    * largest values under the total (v, event_id) order and average the
    * rest, exactly.
    *
    * Scale shape: the q192 two-phase selection discipline instead of a
    * per-group full sort — bucket summaries (count + SUM per coarse value
    * bucket) locate each side's boundary bucket via cumulative offsets;
    * full buckets inside the trim windows contribute their pre-aggregated
    * sums wholesale, and only the two boundary buckets per group are
    * re-scanned for an intra-bucket rank prefix. The exchanges carry
    * bucket summaries and boundary-bucket rows, never a per-group total
    * sort. All integers on the cents lattice; e6 means are exact FLOOR
    * divisions via [[floorDiv]], matching DuckDB's `//` even when a
    * trimmed sum goes negative. */
  def q272TrimmedMean(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir)
      .select(col("event_type").as("g"),
        expr("cast(round(value * 100) as bigint)").as("v"),
        col("event_id").as("ei"))
      .withColumn("vb", expr("v div 100"))
    val wOff = Window.partitionBy("g").orderBy("vb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val summaries = base.groupBy("g", "vb")
      .agg(count(lit(1)).as("bc"), sum("v").as("bs"))
      .withColumn("off", coalesce(sum("bc").over(wOff), lit(0L)))
      .withColumn("n", sum("bc").over(Window.partitionBy("g")))
      .withColumn("t", expr("n div 10"))
    val fullBot = summaries.filter(col("off") + col("bc") <= col("t"))
      .groupBy("g").agg(sum("bs").as("fb"))
    // a bucket lies fully inside the top trim when its rank-from-top
    // offset (n - off - bc) plus its count fits: n - off <= t
    val fullTop = summaries.filter(col("n") - col("off") <= col("t"))
      .groupBy("g").agg(sum("bs").as("ft"))
    val botBound = summaries
      .filter(col("off") < col("t") && col("off") + col("bc") > col("t"))
      .select(col("g"), col("vb"), (col("t") - col("off")).as("take"))
    val topBound = summaries
      .filter(col("n") - col("off") - col("bc") < col("t") &&
        col("n") - col("off") > col("t"))
      .select(col("g"), col("vb"),
        (col("t") - (col("n") - col("off") - col("bc"))).as("take"))
    val wAsc = Window.partitionBy("g", "vb").orderBy(asc("v"), asc("ei"))
    val wDesc = Window.partitionBy("g", "vb").orderBy(desc("v"), desc("ei"))
    val partBot = base.join(broadcast(botBound), Seq("g", "vb"))
      .withColumn("rn", row_number().over(wAsc))
      .filter(col("rn") <= col("take"))
      .groupBy("g").agg(sum("v").as("pb"))
    val partTop = base.join(broadcast(topBound), Seq("g", "vb"))
      .withColumn("rn", row_number().over(wDesc))
      .filter(col("rn") <= col("take"))
      .groupBy("g").agg(sum("v").as("pt"))
    val tot = base.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .withColumn("t", expr("n div 10"))
    tot.join(fullBot, Seq("g"), "left").join(partBot, Seq("g"), "left")
      .join(fullTop, Seq("g"), "left").join(partTop, Seq("g"), "left")
      .select(col("g").as("event_type"),
        col("n").cast("bigint").as("n_events"),
        col("t").cast("bigint").as("n_trim_side"),
        floorDiv("1000000 * sv", "n").cast("bigint").as("mean_e6"),
        floorDiv(
          "1000000 * (sv - coalesce(fb, 0) - coalesce(pb, 0) " +
            "- coalesce(ft, 0) - coalesce(pt, 0))",
          "greatest(n - 2 * t, 1)").cast("bigint").as("trimmed_mean_e6"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q272_trimmed_mean" -> (q272TrimmedMean _),
    "q248_native_histogram" -> (q248NativeHistogram _),
    "q261_hist_rollup" -> (q261HistRollup _),
    "q150_rfm_segments" -> (q150RfmSegments _),
    "q151_share_of_total" -> (q151ShareOfTotal _),
    "q152_robust_stats" -> (q152RobustStats _),
    "q153_largest_remainder" -> (q153LargestRemainder _),
    "q162_ab_test" -> (q162AbTest _),
    "q166_gini" -> (q166Gini _),
    "q167_weighted_median" -> (q167WeightedMedian _),
    "q170_topk_two_phase" -> (q170TopkTwoPhase _),
    "q171_mom_growth" -> (q171MomGrowth _),
    "q174_ks_drift" -> (q174KsDrift _),
    "q182_score_calibration" -> (q182ScoreCalibration _),
    "q183_skyline" -> (q183Skyline _),
    "q184_group_quantiles" -> (q184GroupQuantiles _),
    "q185_auc" -> (q185Auc _),
    "q187_spearman" -> (q187Spearman _),
    "q190_native_topk" -> (q190NativeTopk _),
    "q192_iqr_outliers" -> (q192IqrOutliers _),
    "q193_changepoint" -> (q193Changepoint _),
    "q200_cuped_ab" -> (q200CupedAb _),
  )

  val oracles: Map[String, String] = Map(
    // q272: the oracle trims by rank directly (it needn't be scale-shaped);
    // the bucket-offset form selects the identical rows because vb is
    // monotone in v, so the bucket order refines the (v, ei) total order
    "q272_trimmed_mean" ->
      """WITH b AS (SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v,
        |    event_id AS ei FROM events),
        |r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v, ei) AS rk,
        |    COUNT(*) OVER (PARTITION BY g) AS n FROM b),
        |a AS (SELECT g, n, n // 10 AS t, SUM(v) AS sv,
        |    SUM(CASE WHEN rk > n // 10 AND rk <= n - n // 10 THEN v ELSE 0 END) AS tv
        |  FROM r GROUP BY g, n)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n_events,
        |  CAST(t AS BIGINT) AS n_trim_side,
        |  CAST((1000000 * sv) // n AS BIGINT) AS mean_e6,
        |  CAST((1000000 * tv) // greatest(n - 2 * t, 1) AS BIGINT) AS trimmed_mean_e6
        |FROM a ORDER BY event_type""".stripMargin,
    // direct per-bin counts + the same ceil-rank selection — if the
    // day→global rollup loses or double-counts anything, this mismatches
    "q261_hist_rollup" ->
      """WITH e AS (SELECT
        |    LEAST(511, GREATEST(0, CAST(FLOOR(value) AS BIGINT))) AS bin,
        |    CAST(ts AS DATE) AS day
        |  FROM events),
        |c AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM e GROUP BY bin),
        |cum AS (SELECT bin, cnt, SUM(cnt) OVER (ORDER BY bin) AS cum,
        |    SUM(cnt) OVER () AS n FROM c),
        |d AS (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
        |    CAST(COUNT(*) AS BIGINT) AS n_events FROM e)
        |SELECT d.n_days, d.n_events,
        |  CAST(MIN(CASE WHEN 2 * cum >= n THEN bin END) AS BIGINT) AS p50_bin,
        |  CAST(MIN(CASE WHEN 20 * cum >= 19 * n THEN bin END) AS BIGINT) AS p95_bin,
        |  CAST(MIN(CASE WHEN 100 * cum >= 99 * n THEN bin END) AS BIGINT) AS p99_bin
        |FROM cum CROSS JOIN d GROUP BY d.n_days, d.n_events""".stripMargin,
    // per-bin GROUP BY counts + the identical smallest-bin ceil-rank
    // selection — the sketch's independent formulation
    "q248_native_histogram" ->
      """WITH e AS (SELECT event_type,
        |    LEAST(511, GREATEST(0, CAST(FLOOR(value) AS BIGINT))) AS bin
        |  FROM events),
        |c AS (SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM e GROUP BY event_type, bin),
        |cum AS (SELECT event_type, bin, cnt,
        |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |    SUM(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM c)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
        |  CAST(MIN(CASE WHEN 2 * cum >= n THEN bin END) AS BIGINT) AS p50_bin,
        |  CAST(MIN(CASE WHEN 20 * cum >= 19 * n THEN bin END) AS BIGINT) AS p95_bin
        |FROM cum GROUP BY event_type ORDER BY event_type""".stripMargin,
    // boundaries re-derived via row_number (a global sort is fine in the
    // oracle engine); identical rank targets and tuple comparisons
    "q150_rfm_segments" ->
      """WITH anchor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS a FROM orders),
        |pc AS (SELECT o_custkey AS ck,
        |    CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
        |      (SELECT a FROM anchor)) AS BIGINT) AS r,
        |    COUNT(*) AS f,
        |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS m
        |  FROM orders GROUP BY o_custkey),
        |n AS (SELECT COUNT(*) AS n FROM pc),
        |rr AS (SELECT r AS v, ck, row_number() OVER (ORDER BY r, ck) AS rn FROM pc),
        |ff AS (SELECT f AS v, ck, row_number() OVER (ORDER BY f, ck) AS rn FROM pc),
        |mm AS (SELECT m AS v, ck, row_number() OVER (ORDER BY m, ck) AS rn FROM pc),
        |b AS (SELECT
        |    (SELECT v FROM rr, n WHERE rn = n.n // 3) AS r1v,
        |    (SELECT ck FROM rr, n WHERE rn = n.n // 3) AS r1c,
        |    (SELECT v FROM rr, n WHERE rn = 2 * n.n // 3) AS r2v,
        |    (SELECT ck FROM rr, n WHERE rn = 2 * n.n // 3) AS r2c,
        |    (SELECT v FROM ff, n WHERE rn = n.n // 3) AS f1v,
        |    (SELECT ck FROM ff, n WHERE rn = n.n // 3) AS f1c,
        |    (SELECT v FROM ff, n WHERE rn = 2 * n.n // 3) AS f2v,
        |    (SELECT ck FROM ff, n WHERE rn = 2 * n.n // 3) AS f2c,
        |    (SELECT v FROM mm, n WHERE rn = n.n // 3) AS m1v,
        |    (SELECT ck FROM mm, n WHERE rn = n.n // 3) AS m1c,
        |    (SELECT v FROM mm, n WHERE rn = 2 * n.n // 3) AS m2v,
        |    (SELECT ck FROM mm, n WHERE rn = 2 * n.n // 3) AS m2c),
        |seg AS (SELECT pc.ck, pc.m,
        |    'r' || (CASE WHEN pc.r < b.r1v OR (pc.r = b.r1v AND pc.ck <= b.r1c) THEN 1
        |        WHEN pc.r < b.r2v OR (pc.r = b.r2v AND pc.ck <= b.r2c) THEN 2
        |        ELSE 3 END)
        |    || 'f' || (CASE WHEN pc.f < b.f1v OR (pc.f = b.f1v AND pc.ck <= b.f1c) THEN 1
        |        WHEN pc.f < b.f2v OR (pc.f = b.f2v AND pc.ck <= b.f2c) THEN 2
        |        ELSE 3 END)
        |    || 'm' || (CASE WHEN pc.m < b.m1v OR (pc.m = b.m1v AND pc.ck <= b.m1c) THEN 1
        |        WHEN pc.m < b.m2v OR (pc.m = b.m2v AND pc.ck <= b.m2c) THEN 2
        |        ELSE 3 END) AS segment
        |  FROM pc CROSS JOIN b)
        |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(m) AS BIGINT) AS m_cents_total
        |FROM seg GROUP BY segment ORDER BY segment""".stripMargin,
    // exact e4-unit revenue; one double division per share
    "q151_share_of_total" ->
      """WITH rev AS (SELECT r.r_name AS region_name, nt.n_name AS nation_name,
        |    SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |        (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS rev_e4
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation nt ON nt.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = nt.n_regionkey
        |  GROUP BY r.r_name, nt.n_name)
        |SELECT region_name, nation_name, CAST(rev_e4 AS BIGINT) AS rev_e4,
        |  CAST(rev_e4 AS DOUBLE) /
        |    CAST(SUM(rev_e4) OVER (PARTITION BY region_name) AS DOUBLE)
        |    AS share_of_region,
        |  CAST(rev_e4 AS DOUBLE) / CAST(SUM(rev_e4) OVER () AS DOUBLE)
        |    AS share_of_global
        |FROM rev ORDER BY region_name, nation_name""".stripMargin,
    // the selection arithmetic of q138's oracle, run twice (value, then
    // absolute deviation from the median)
    "q152_robust_stats" ->
      """WITH b AS (SELECT event_type AS g, value AS v FROM events),
        |n AS (SELECT g, COUNT(*) AS n FROM b GROUP BY g),
        |r1 AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn FROM b),
        |med AS (SELECT r1.g,
        |    (MIN(CASE WHEN rn = (n.n + 1) // 2 THEN v END) +
        |     MIN(CASE WHEN rn = n.n // 2 + 1 THEN v END)) / 2 AS median
        |  FROM r1 JOIN n ON n.g = r1.g GROUP BY r1.g),
        |d AS (SELECT b.g, abs(b.v - med.median) AS v
        |  FROM b JOIN med ON med.g = b.g),
        |r2 AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn FROM d),
        |mad AS (SELECT r2.g,
        |    (MIN(CASE WHEN rn = (n.n + 1) // 2 THEN v END) +
        |     MIN(CASE WHEN rn = n.n // 2 + 1 THEN v END)) / 2 AS mad
        |  FROM r2 JOIN n ON n.g = r2.g GROUP BY r2.g)
        |SELECT n.g AS event_type, CAST(n.n AS BIGINT) AS n, med.median, mad.mad
        |FROM n JOIN med ON med.g = n.g JOIN mad ON mad.g = n.g
        |ORDER BY event_type""".stripMargin,
    // pure integer quotient/remainder arithmetic, identical both sides
    "q153_largest_remainder" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem WHERE l_orderkey < 3000),
        |x AS (SELECT l_orderkey, l_linenumber, qty,
        |    SUM(qty) OVER (PARTITION BY l_orderkey) AS qsum FROM li),
        |y AS (SELECT l_orderkey, l_linenumber, qty,
        |    (1000 * qty) // qsum AS base, (1000 * qty) % qsum AS rem,
        |    1000 - SUM((1000 * qty) // qsum) OVER (PARTITION BY l_orderkey)
        |      AS leftover
        |  FROM x),
        |z AS (SELECT l_orderkey, l_linenumber, qty, base, leftover,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY rem DESC, l_linenumber ASC) AS rk
        |  FROM y)
        |SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber, qty,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc
        |FROM z ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // identical salted-nibble assignment, exact integer moments,
    // identical Welch chain with terminal floor
    "q162_ab_test" ->
      """WITH pu AS (SELECT user_id,
        |    SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS m
        |  FROM events GROUP BY user_id),
        |pa AS (SELECT CASE WHEN substr(md5('ab1_' || CAST(user_id AS VARCHAR)), 1, 1)
        |      IN ('0','1','2','3','4','5','6','7') THEN 'A' ELSE 'B' END AS arm, m
        |  FROM pu),
        |ag AS (SELECT arm, COUNT(*) AS n, SUM(m) AS sm, SUM(m * m) AS qm
        |  FROM pa GROUP BY arm),
        |ab AS (SELECT
        |    (SELECT n FROM ag WHERE arm = 'A') AS na,
        |    (SELECT sm FROM ag WHERE arm = 'A') AS sa,
        |    (SELECT qm FROM ag WHERE arm = 'A') AS qa,
        |    (SELECT n FROM ag WHERE arm = 'B') AS nb,
        |    (SELECT sm FROM ag WHERE arm = 'B') AS sb,
        |    (SELECT qm FROM ag WHERE arm = 'B') AS qb),
        |c AS (SELECT na, nb,
        |    CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
        |    CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
        |    CAST(na * qa - sa * sa AS DOUBLE)
        |      / CAST(na * (na - 1) AS DOUBLE) AS va,
        |    CAST(nb * qb - sb * sb AS DOUBLE)
        |      / CAST(nb * (nb - 1) AS DOUBLE) AS vb
        |  FROM ab)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  ma / 100.0 AS mean_a, mb / 100.0 AS mean_b,
        |  CAST(FLOOR((ma - mb) / sqrt(va / CAST(na AS DOUBLE)
        |    + vb / CAST(nb AS DOUBLE)) * 1000000.0) AS BIGINT) AS t_e6
        |FROM c""".stripMargin,
    // global rank via row_number (a global sort is fine in the oracle
    // engine); identical rank formula and terminal chain
    "q166_gini" ->
      """WITH pc AS (SELECT o_custkey AS ck,
        |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS m
        |  FROM orders GROUP BY o_custkey),
        |r AS (SELECT m, row_number() OVER (ORDER BY m, ck) AS rank FROM pc),
        |a AS (SELECT COUNT(*) AS n, SUM(m) AS s0, SUM(rank * m) AS s1 FROM r)
        |SELECT CAST(n AS BIGINT) AS n_customers,
        |  CAST(s0 AS BIGINT) AS total_cents,
        |  CAST(FLOOR(CAST(2 * s1 - (n + 1) * s0 AS DOUBLE)
        |    / CAST(n * s0 AS DOUBLE) * 1000000.0) AS BIGINT) AS gini_e6
        |FROM a""".stripMargin,
    // cumulative weight is monotone under the (w, doc_id) total order,
    // so MIN(w) over crossing rows is the boundary value
    "q167_weighted_median" ->
      """WITH d AS (SELECT lang, doc_id, n_chars AS w FROM documents),
        |t AS (SELECT lang, SUM(w) AS wtot, (SUM(w) + 1) // 2 AS target
        |  FROM d GROUP BY lang),
        |c AS (SELECT lang, w, doc_id,
        |    SUM(w) OVER (PARTITION BY lang ORDER BY w, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d),
        |x AS (SELECT c.lang, c.w, t.wtot FROM c
        |  JOIN t ON t.lang = c.lang WHERE c.cum >= t.target)
        |SELECT lang, CAST(wtot AS BIGINT) AS total_chars,
        |  CAST(MIN(w) AS BIGINT) AS weighted_median_len
        |FROM x GROUP BY lang, wtot ORDER BY lang""".stripMargin,
    // one-window form: identical because the two-phase selection is
    // lossless (pigeonhole) and the ranking key is an exact total order
    "q170_topk_two_phase" ->
      """WITH rev AS (SELECT nt.n_name AS nation, l.l_partkey AS part,
        |    SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |        (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS rev_e4
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation nt ON nt.n_nationkey = c.c_nationkey
        |  GROUP BY nt.n_name, l.l_partkey),
        |r AS (SELECT nation, part, rev_e4, row_number() OVER (
        |    PARTITION BY nation ORDER BY rev_e4 DESC, part) AS rank
        |  FROM rev)
        |SELECT nation, CAST(rank AS INTEGER) AS rank,
        |  CAST(part AS BIGINT) AS part, CAST(rev_e4 AS BIGINT) AS rev_e4
        |FROM r WHERE rank <= 3 ORDER BY nation, rank""".stripMargin,
    "q171_mom_growth" ->
      """WITH m AS (SELECT r.r_name AS region,
        |    CAST(date_trunc('month', l.l_shipdate) AS DATE) AS m,
        |    SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |        (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS rev_e4
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation nt ON nt.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = nt.n_regionkey
        |  GROUP BY r.r_name, CAST(date_trunc('month', l.l_shipdate) AS DATE)),
        |x AS (SELECT region, m, rev_e4,
        |    LAG(rev_e4) OVER (PARTITION BY region ORDER BY m) AS prev
        |  FROM m)
        |SELECT region, m, CAST(rev_e4 AS BIGINT) AS rev_e4,
        |  CAST(rev_e4 - prev AS BIGINT) AS delta_e4,
        |  CAST(FLOOR(CAST(rev_e4 - prev AS DOUBLE) / CAST(prev AS DOUBLE)
        |    * 1000000.0) AS BIGINT) AS growth_e6
        |FROM x WHERE prev IS NOT NULL ORDER BY region, m""".stripMargin,
    // sup over exact cross-multiplied BIGINTs; one terminal division
    "q174_ks_drift" ->
      """WITH c AS (SELECT value,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY value),
        |cdf AS (SELECT value,
        |    SUM(c1) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
        |    SUM(c2) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
        |    SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
        |  FROM c),
        |d AS (SELECT value, n1, n2, ABS(cum1 * n2 - cum2 * n1) AS dnum,
        |    MAX(ABS(cum1 * n2 - cum2 * n1)) OVER () AS dmax
        |  FROM cdf)
        |SELECT CAST(MIN(n1) AS BIGINT) AS n_click,
        |  CAST(MIN(n2) AS BIGINT) AS n_view,
        |  CAST(MIN(dmax) AS BIGINT) AS d_num,
        |  CAST(MIN(dmax) AS DOUBLE)
        |    / CAST(MIN(n1) * MIN(n2) AS DOUBLE) AS ks,
        |  MIN(CASE WHEN dnum = dmax THEN value END) AS at_value
        |FROM d""".stripMargin,
    // the reflected two-phase rank == ORDER BY score DESC, user DESC
    "q182_score_calibration" ->
      """WITH mx AS (SELECT MAX(epoch_us(ts)) AS a FROM events),
        |sc AS (SELECT user_id,
        |    SUM(CAST(round(value * 100) AS BIGINT) *
        |      (1000000 >> LEAST(((SELECT a FROM mx) - epoch_us(ts))
        |        // 604800000000, 20))) AS score,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM events GROUP BY user_id),
        |r AS (SELECT score, converted, row_number() OVER (
        |    ORDER BY score DESC, user_id DESC) AS rank_desc,
        |    COUNT(*) OVER () AS n
        |  FROM sc),
        |d AS (SELECT ((rank_desc - 1) * 10) // n + 1 AS decile, converted
        |  FROM r),
        |g AS (SELECT decile, COUNT(*) AS n_users, SUM(converted) AS n_conv
        |  FROM d GROUP BY decile),
        |t AS (SELECT SUM(n_conv) AS total FROM g)
        |SELECT CAST(decile AS INTEGER) AS decile,
        |  CAST(n_users AS BIGINT) AS n_users,
        |  CAST(n_conv AS BIGINT) AS n_conv,
        |  CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS conversion_rate,
        |  CAST(SUM(n_conv) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_conv,
        |  CAST(SUM(n_conv) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST((SELECT total FROM t) AS DOUBLE) AS cum_capture
        |FROM g ORDER BY decile""".stripMargin,
    // identical rank targets ((p * (n-1)) // 100 + 1) under the
    // identical (v, event_id) total order; the oracle affords the
    // per-group sort the two-phase selection exists to avoid
    "q184_group_quantiles" ->
      """WITH b AS (SELECT event_type AS g,
        |    CAST(round(value * 100) AS BIGINT) AS v, event_id AS ei
        |  FROM events),
        |r AS (SELECT g, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v, ei) AS rn,
        |    COUNT(*) OVER (PARTITION BY g) AS n
        |  FROM b)
        |SELECT g AS event_type, CAST(MIN(n) AS BIGINT) AS n_events,
        |  CAST(MIN(CASE WHEN rn = (50 * (n - 1)) // 100 + 1 THEN v END)
        |    AS BIGINT) AS p50_cents,
        |  CAST(MIN(CASE WHEN rn = (90 * (n - 1)) // 100 + 1 THEN v END)
        |    AS BIGINT) AS p90_cents,
        |  CAST(MIN(CASE WHEN rn = (99 * (n - 1)) // 100 + 1 THEN v END)
        |    AS BIGINT) AS p99_cents
        |FROM r GROUP BY g ORDER BY event_type""".stripMargin,
    // identical q175/q182 score arithmetic; the oracle's single-window
    // cumulative is the shape the two-phase Spark plan replaces, and
    // both sides sum the identical BIGINT 2U terms
    "q185_auc" ->
      """WITH mx AS (SELECT MAX(epoch_us(ts)) - 86400000000 AS cut FROM events),
        |sc AS (SELECT user_id,
        |    SUM(CASE WHEN epoch_us(ts) <= (SELECT cut FROM mx)
        |      THEN CAST(round(value * 100) AS BIGINT) *
        |        (1000000 >> LEAST(((SELECT cut FROM mx) - epoch_us(ts))
        |          // 604800000000, 20))
        |      ELSE 0 END) AS score,
        |    MAX(CASE WHEN event_type = 'purchase'
        |      AND epoch_us(ts) > (SELECT cut FROM mx)
        |      THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |g AS (SELECT score, SUM(conv) AS pos_s,
        |    SUM(1 - conv) AS neg_s
        |  FROM sc GROUP BY score),
        |c AS (SELECT score, pos_s, neg_s,
        |    COALESCE(SUM(neg_s) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumneg
        |  FROM g)
        |SELECT CAST(SUM(pos_s) AS BIGINT) AS n_pos,
        |  CAST(SUM(neg_s) AS BIGINT) AS n_neg,
        |  CAST(SUM(pos_s * (2 * cumneg + neg_s)) AS BIGINT) AS u_doubled,
        |  CAST(SUM(pos_s * (2 * cumneg + neg_s)) AS DOUBLE)
        |    / CAST(2 * SUM(pos_s) * SUM(neg_s) AS DOUBLE) AS auc
        |FROM c""".stripMargin,
    // identical doubled tie-averaged ranks (2·rank() + ties − 1 ==
    // 2·below + ties + 1) via one global window (the shape the
    // two-phase Spark plan replaces); identical q181 moment chain
    "q187_spearman" ->
      """WITH u AS (SELECT user_id, COUNT(*) AS x,
        |    SUM(CAST(round(value * 100) AS BIGINT)) AS y
        |  FROM events GROUP BY user_id),
        |r AS (SELECT
        |    2 * RANK() OVER (ORDER BY x) + COUNT(*) OVER (PARTITION BY x) - 1 AS rx,
        |    2 * RANK() OVER (ORDER BY y) + COUNT(*) OVER (PARTITION BY y) - 1 AS ry
        |  FROM u),
        |m AS (SELECT COUNT(*) AS n, SUM(rx) AS sx, SUM(ry) AS sy,
        |    SUM(rx * ry) AS sxy, SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
        |  FROM r)
        |SELECT CAST(n AS BIGINT) AS n_users,
        |  CAST(FLOOR(
        |    CAST(n * sxy - sx * sy AS DOUBLE) /
        |    SQRT(CAST(n * sxx - sx * sx AS DOUBLE) *
        |         CAST(n * syy - sy * sy AS DOUBLE)) * 1000000.0)
        |    AS BIGINT) AS rho_e6
        |FROM m""".stripMargin,
    // the window-ranked form: both engines express the identical total
    // (value DESC, event_id ASC) order the bounded-state aggregate keeps
    "q190_native_topk" ->
      """WITH r AS (SELECT event_type, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS vc,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY CAST(round(value * 100) AS BIGINT) DESC, event_id)
        |      AS rn
        |  FROM events)
        |SELECT event_type, CAST(rn AS INTEGER) AS rank, event_id,
        |  CAST(vc AS BIGINT) AS v_cents
        |FROM r WHERE rn <= 5 ORDER BY event_type, rank""".stripMargin,
    // identical q184 rank targets; identical integer fence tests
    // (2v vs 5·q1 − 3·q3) — no 1.5 ever becomes a double
    "q192_iqr_outliers" ->
      """WITH b AS (SELECT event_type AS g,
        |    CAST(round(value * 100) AS BIGINT) AS v, event_id AS ei
        |  FROM events),
        |r AS (SELECT g, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v, ei) AS rn,
        |    COUNT(*) OVER (PARTITION BY g) AS n
        |  FROM b),
        |q AS (SELECT g,
        |    MIN(CASE WHEN rn = (25 * (n - 1)) // 100 + 1 THEN v END) AS q1,
        |    MIN(CASE WHEN rn = (75 * (n - 1)) // 100 + 1 THEN v END) AS q3
        |  FROM r GROUP BY g)
        |SELECT b.g AS event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN 2 * b.v < 5 * q.q1 - 3 * q.q3
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
        |  CAST(SUM(CASE WHEN 2 * b.v > 5 * q.q3 - 3 * q.q1
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers,
        |  CAST(FLOOR(CAST(SUM(CASE WHEN 2 * b.v < 5 * q.q1 - 3 * q.q3
        |        OR 2 * b.v > 5 * q.q3 - 3 * q.q1 THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1000000.0)
        |    AS BIGINT) AS outlier_share_e6
        |FROM b JOIN q ON q.g = b.g
        |GROUP BY b.g ORDER BY event_type""".stripMargin,
    // identical scaled CUSUM |m·C_i − i·T| on the integer lattice;
    // earliest attaining day; one mirrored terminal division
    "q193_changepoint" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    COUNT(*) AS c FROM events GROUP BY event_type, d),
        |x AS (SELECT event_type, d, c,
        |    row_number() OVER w AS i,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ci,
        |    COUNT(*) OVER (PARTITION BY event_type) AS m,
        |    SUM(c) OVER (PARTITION BY event_type) AS t
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)),
        |v AS (SELECT event_type, d, m, t,
        |    ABS(m * ci - i * t) AS dev,
        |    MAX(ABS(m * ci - i * t)) OVER (PARTITION BY event_type) AS dmax
        |  FROM x)
        |SELECT event_type, CAST(MIN(m) AS BIGINT) AS n_days,
        |  CAST(MIN(t) AS BIGINT) AS n_events,
        |  MIN(CASE WHEN dev = dmax THEN d END) AS cp_day,
        |  CAST(MIN(dmax) AS BIGINT) AS dev_num,
        |  CAST(FLOOR(CAST(MIN(dmax) AS DOUBLE) /
        |    CAST(MIN(m) * MIN(t) AS DOUBLE) * 1000000.0) AS BIGINT)
        |    AS dev_e6
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin,
    // identical q162 arm hash, identical pre/post cut, and the
    // identical fixed-order double chain over exact BIGINT moments
    "q200_cuped_ab" ->
      """WITH mx AS (SELECT MAX(epoch_us(ts)) - 1209600000000 AS cut FROM events),
        |u AS (SELECT user_id,
        |    SUM(CASE WHEN event_type = 'purchase'
        |      AND epoch_us(ts) <= (SELECT cut FROM mx)
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS x,
        |    SUM(CASE WHEN event_type = 'purchase'
        |      AND epoch_us(ts) > (SELECT cut FROM mx)
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y,
        |    CASE WHEN substr(md5(concat('ab1_', CAST(user_id AS VARCHAR))), 1, 1)
        |      IN ('0','1','2','3','4','5','6','7') THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id),
        |g AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy FROM u),
        |a AS (SELECT COUNT(*) AS na, SUM(x) AS sxa, SUM(y) AS sya
        |  FROM u WHERE arm = 'A'),
        |b AS (SELECT COUNT(*) AS nb, SUM(x) AS sxb, SUM(y) AS syb
        |  FROM u WHERE arm = 'B'),
        |c AS (SELECT na, nb,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
        |    CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) AS ya,
        |    CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) AS xa,
        |    CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE) AS yb,
        |    CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE) AS xb,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) AS cnum,
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS vx,
        |    (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS vy
        |  FROM g, a, b)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(FLOOR(theta * 1000000.0) AS BIGINT) AS theta_e6,
        |  (ya - theta * (xa - xbar)) / 100.0 AS mean_adj_a,
        |  (yb - theta * (xb - xbar)) / 100.0 AS mean_adj_b,
        |  ((ya - theta * (xa - xbar)) - (yb - theta * (xb - xbar))) / 100.0
        |    AS adj_lift,
        |  CAST(FLOOR(cnum * cnum / (vx * vy) * 1000000.0) AS BIGINT)
        |    AS rho2_e6
        |FROM c""".stripMargin,
    // plain NOT EXISTS dominance — the oracle engine affords the
    // quadratic the grid pruning exists to avoid
    "q183_skyline" ->
      """WITH anchor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS a FROM orders),
        |pc AS (SELECT o_custkey AS ck,
        |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS m,
        |    CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
        |      (SELECT a FROM anchor)) AS BIGINT) AS r
        |  FROM orders GROUP BY o_custkey)
        |SELECT ck, CAST(m AS BIGINT) AS spend_cents, r AS recency_days
        |FROM pc p
        |WHERE NOT EXISTS (SELECT 1 FROM pc q
        |  WHERE q.m >= p.m AND q.r <= p.r AND (q.m > p.m OR q.r < p.r))
        |ORDER BY ck""".stripMargin,
  )
}
