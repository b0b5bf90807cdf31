package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession.{sfDir, spark}
import graft.Tables

/** BOARD-WIDE INTEGER-HEADROOM AUDIT for the exact-moment chains
  * (q110, q157, q162, q166, q181, q187, q198, q200). Each of those
  * queries claims, in its scaladoc, that its integer sums cannot
  * overflow the container they accumulate in (int64 for LongType sums,
  * 10^38 for decimal(38,0)). Those claims are PREMISES about operand
  * ranges — daily counts, quantized cents, embedding components — and
  * a premise stated in a comment is not a premise checked. This spec
  * measures the actual operand ranges from the fixtures and asserts
  * each query's worst-case accumulation term against its container,
  * the q197 offset-premise pattern generalized: if a fixture regen (or
  * a quantization-scale change) ever pushes an operand past its
  * documented bound, the board fails HERE with the violated inequality
  * named, instead of silently wrapping (non-ANSI) or erroring
  * mid-query (ANSI) at a scale nobody tested.
  *
  * Conventions: every bound is the conservative worst case of the
  * query's own chain (e.g. n·Σx² ≤ n²·max|x|² for a Pearson
  * numerator term), evaluated in BigDecimal so the CHECK itself cannot
  * overflow; `margin` additionally asserts two decimal orders of
  * spare headroom so linear fixture growth between rounds cannot land
  * exactly on the edge. */
class MomentHeadroomSpec extends AnyFunSuite {

  private val I64 = BigDecimal(Long.MaxValue)
  private val D38 = BigDecimal(10).pow(38)

  /** Assert `worst < cap / 100` — the extra two orders keep a
    * same-shape fixture regen from landing on the boundary. */
  private def checkRoom(what: String, worst: BigDecimal, cap: BigDecimal): Unit =
    assert(worst < cap / 100,
      s"$what: worst-case accumulation $worst is within 100x of its " +
        s"container capacity $cap — the documented headroom claim no longer holds")

  private def bd(l: Long): BigDecimal = BigDecimal(l)

  test("q110: value-hour moments fit decimal(38,0) — n^2 * maxX^2 bound") {
    // x = floor(value*1e6), y = hour <= 23; sums accumulate in
    // decimal(38,0) and the assembled terms are n*sxx, sx*sx, n*sxy
    val r = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("abs(cast(floor(value * 1e6) as bigint))").as("ax"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max("ax").as("mx"))
      .agg(max(col("n")).as("n"), max("mx").as("mx")).head()
    val (n, mx) = (bd(r.getLong(0)), bd(r.getLong(1)))
    checkRoom("q110 n*sxx <= n^2*maxX^2", n * n * mx * mx, D38)
  }

  test("q157: covariance lattice fits int64 — 2 * n^2 * maxAq^2 bound") {
    // aq = round(component*1e4); cov_e8 = n*pij - si*sj, both terms
    // bounded by n^2 * maxAq^2, accumulated in plain LongType
    val r = Tables.embeddings(spark, sfDir)
      .select(explode(expr(
        "transform(embedding, x -> abs(cast(round(cast(x as double) * 10000) as bigint)))"))
        .as("a"))
      .agg(count(lit(1)).as("cells"), max("a").as("ma")).head()
    val nVec = Tables.embeddings(spark, sfDir).count()
    val ma = bd(r.getLong(1))
    checkRoom("q157 |n*pij|+|si*sj| <= 2*n^2*maxAq^2",
      2 * bd(nVec) * bd(nVec) * ma * ma, I64)
  }

  test("q162: Welch arm moments fit int64 — n^2 * maxM^2 bound") {
    // m = per-user purchase cents (LongType sums); var numerator is
    // n*qm - sm^2, both bounded by n^2 * maxM^2
    val r = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase",
        expr("cast(round(value * 100) as bigint)")).otherwise(0L)).as("m"))
      .agg(count(lit(1)).as("n"), max(abs(col("m"))).as("mm")).head()
    val (n, mm) = (bd(r.getLong(0)), bd(r.getLong(1)))
    checkRoom("q162 n*qm <= n^2*maxM^2", n * n * mm * mm, I64)
  }

  test("q166: gini rank-weighted spend fits int64 — 3 * n^2 * maxM bound") {
    // s1 = sum(rank*m) <= n * (n*maxM); the assembled numerator is
    // 2*s1 - (n+1)*s0 <= 3 * n^2 * maxM
    val r = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("m"))
      .agg(count(lit(1)).as("n"), max(abs(col("m"))).as("mm")).head()
    val (n, mm) = (bd(r.getLong(0)), bd(r.getLong(1)))
    checkRoom("q166 2*s1+(n+1)*s0 <= 3*n^2*maxM", 3 * n * n * mm, I64)
  }

  test("q181/q198: daily-count ACF moments fit int64 — days^2 * maxC^2 bound") {
    // shared premise for both autocorrelation chains (q198 is q181 at
    // lags 1..7 — same day-summary operands): n_pairs <= observed days,
    // x,y <= max daily count, LongType sums, n*sxx <= days^2 * maxC^2
    val r = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("days"), max("c").as("mc"))
      .agg(max("days").as("days"), max("mc").as("mc")).head()
    val (days, mc) = (bd(r.getLong(0)), bd(r.getLong(1)))
    checkRoom("q181/q198 n*sxx <= days^2*maxC^2", days * days * mc * mc, I64)
    // and the q197 Theil-Sen offset premise rides the same operands:
    // daily count < 1e6 keeps dp + 1e6*dq positive (EvalWaveSpec's
    // original assertion, kept co-located with its family here too)
    assert(mc < BigDecimal(1000000), s"daily count $mc breaks the q197 offset")
  }

  test("q187: doubled-rank Spearman moments fit decimal(38,0) — 4*n^4 bound") {
    // doubled ranks are <= 2n+1 by construction (r2 = 2*below+cnt+1
    // with below+cnt <= n); sxy accumulates in decimal(38,0) after the
    // decimal(19,0) cast, and the assembled n*sxy is bounded by
    // n * n*(2n+1)^2 ~ 4*n^4
    val n = Tables.events(spark, sfDir).select("user_id").distinct().count()
    checkRoom("q187 n*sxy <= 4*n^4", 4 * bd(n).pow(4), D38)
  }

  test("q243/q254: shrinkage rationals fit int64 — 1e6 * N^2 bound") {
    // shrunk_e6's numerator is 1e6*(k*N + m*K) <= 1e6*(1+m)*N^2 with
    // m = 20 pseudo-docs; q254's allocation reuses the same operands
    val n = Tables.documents(spark, sfDir).count()
    checkRoom("q243 1e6*(k*N + 20*K) <= 21e6*N^2",
      BigDecimal(21000000) * bd(n) * bd(n), I64)
  }

  test("q244: kappa cells fit int64 — 1e6 * n^2 bound") {
    // pe's numerator X <= n^2 and the e6 readout multiplies by 1e6
    val n = Tables.documents(spark, sfDir).count()
    checkRoom("q244 1e6*n^2", BigDecimal(1000000) * bd(n) * bd(n), I64)
  }

  test("q249: join-cardinality products fit int64 — 1e6 * maxCa * maxCb bound") {
    // pairs = ca*cb per key; share_e6 multiplies total_pairs by 1e6
    val ca = Tables.events(spark, sfDir).groupBy("user_id").count()
      .agg(max("count"), sum("count")).head()
    val cb = Tables.orders(spark, sfDir).groupBy("o_custkey").count()
      .agg(max("count")).head()
    val total = bd(ca.getLong(1)) * bd(cb.getLong(0)) // <= sum(ca)*maxCb
    checkRoom("q249 1e6*total_pairs <= 1e6*sum(ca)*maxCb",
      BigDecimal(1000000) * total, I64)
  }

  test("q259: balance lift fits int64 — 1e6 * N^2 bound") {
    // lift_e6's numerator is 1e6 * n_cell * n_total <= 1e6 * N^2
    val n = Tables.embeddings(spark, sfDir).count()
    checkRoom("q259 1e6*n_cell*N <= 1e6*N^2",
      BigDecimal(1000000) * bd(n) * bd(n), I64)
  }

  test("q264: Fano numerator fits int64 — 1e6 * days * maxC^2 bound") {
    // numerator = 1e6 * (n_days * s2 - S^2), with s2 <= days * maxC^2
    val r = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("days"), max("c").as("mc"))
      .agg(max("days").as("days"), max("mc").as("mc")).head()
    val (days, mc) = (bd(r.getLong(0)), bd(r.getLong(1)))
    checkRoom("q264 1e6*days^2*maxC^2",
      BigDecimal(1000000) * days * days * mc * mc, I64)
  }

  test("q200: CUPED covariate moments fit int64 — n * maxX * maxY bound") {
    // global sxy = sum(x*y) accumulates in LongType; x, y are per-user
    // pre/post cents; the assembled chain takes sums to double FIRST
    // (the q188 rule), so only the integer SUMS need exactness
    val r = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase",
        expr("cast(round(value * 100) as bigint)")).otherwise(0L)).as("m"))
      .agg(count(lit(1)).as("n"), max(abs(col("m"))).as("mm")).head()
    // x and y partition m by time, so max|x|, max|y| <= max|m|
    val (n, mm) = (bd(r.getLong(0)), bd(r.getLong(1)))
    checkRoom("q200 sxy <= n*maxX*maxY", n * mm * mm, I64)
  }
}
