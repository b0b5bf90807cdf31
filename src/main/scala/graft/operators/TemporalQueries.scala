package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-9 fourth-wave temporal/sequence analytics: the time-series
  * operators an events warehouse grows next — interval concurrency,
  * ordered path assembly, time-weighted means over irregular samples,
  * trailing-window anomaly detection, and gap densification with
  * forward fill. Reference analog: these extend the dashboard family of
  * `/root/reference/sql/aggregations.sql` (hourly histograms :29-34, the
  * 7-day moving average :36-42) from regular calendar grids to
  * irregular event time.
  *
  * Determinism contract (results hash-compare against DuckDB): all
  * cross-row accumulation is BIGINT-exact; doubles appear only in
  * per-row chains of individually-correctly-rounded ops (+,-,*,/,sqrt)
  * applied in the SAME order by both engines, or through a terminal
  * floor/round quantization of such a chain. Every window partitions by
  * a scaling entity key (user_id) or consumes bounded per-group
  * SUMMARIES beneath an aggregate (the q68/SCALE.md discipline —
  * StragglerGuardSpec sweeps these plans like every registration).
  */
object TemporalQueries {

  // ---------------------------------------------------------------- q143

  /** Maximum interval concurrency (sweep line) — "how many shipments
    * were in transit on the busiest day", per return flag. Each lineitem
    * occupies the derived interval [l_shipdate, l_shipdate + l_quantity
    * days) — a deterministic transit window the fixture lacks a second
    * timestamp for (the reference's journeys carry a real
    * [start_timestamp, end_timestamp) pair; this is that operator over
    * the fixture's one date).
    *
    * The sweep is the scale-safe form: every interval contributes a
    * +1/-1 boundary delta, deltas collapse to per-(flag, date) NET
    * changes (one map-side-combinable shuffle on a scaling key), and the
    * running concurrency is a window over those bounded date SUMMARIES —
    * never over interval rows. A naive per-day expansion (explode one
    * row per occupied day) would multiply the fact table by mean
    * interval length; the sweep reads it once. */
  def q143MaxConcurrency(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_returnflag").as("flag"),
      col("l_shipdate").cast("date").as("d0"),
      expr("date_add(cast(l_shipdate as date), cast(l_quantity as int))").as("d1"))
    val deltas = li.select(col("flag"), col("d0").as("d"), lit(1L).as("delta"))
      .unionAll(li.select(col("flag"), col("d1").as("d"), lit(-1L).as("delta")))
      .groupBy("flag", "d").agg(sum("delta").as("net"))
    val conc = deltas.withColumn("c",
      sum("net").over(Window.partitionBy("flag").orderBy("d")))
    val peaks = conc.withColumn("peak",
        max("c").over(Window.partitionBy("flag")))
      .filter(col("c") === col("peak"))
      .groupBy("flag")
      .agg(first("peak").cast("bigint").as("peak_concurrency"),
        min("d").as("peak_date"))
    peaks.select(col("flag").as("l_returnflag"), col("peak_concurrency"),
        col("peak_date"))
      .orderBy("l_returnflag")
  }

  /** Test-only brute baseline for TemporalSpec: concurrency at a date =
    * COUNT of intervals containing it; checked at every boundary date. */
  private[graft] def concurrencyBrute(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_returnflag").as("flag"),
      col("l_shipdate").cast("date").as("d0"),
      expr("date_add(cast(l_shipdate as date), cast(l_quantity as int))").as("d1"))
    val dates = li.select(col("flag"), col("d0").as("d")).distinct()
    dates.join(li, Seq("flag"))
      .filter(col("d0") <= col("d") && col("d") < col("d1"))
      .groupBy("flag", "d").agg(count(lit(1)).as("c"))
      .groupBy("flag").agg(max("c").as("peak"))
  }

  // ---------------------------------------------------------------- q145

  /** Ordered per-user event path — deterministic LISTAGG/STRING_AGG
    * parity (BigQuery's STRING_AGG over the analytics view is the
    * reference-dialect analog). The grouped collect is sorted by the
    * TOTAL (ts, event_id) order before joining, so the assembled string
    * is engine-independent where a bare collect_list/string_agg without
    * ORDER BY is partition-order-arbitrary — the q129 tie rule applied
    * to sequence assembly (q122 hashes ordered sequences; this is the
    * presentation-string form a dashboard exports).
    *
    * Scale: one shuffle on user_id; per-group state is the user's own
    * event list — bounded by per-entity activity, the sessionize
    * assumption (q39/q122), never by corpus size. */
  def q145EventPaths(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("user_id") < 40)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type")),
          ",").as("path"))
      .select(col("user_id"), col("n_events").cast("bigint").as("n_events"),
        col("path"))
      .orderBy("user_id")

  // ---------------------------------------------------------------- q146

  /** Time-weighted average over irregular samples (last-value-hold): the
    * mean of a piecewise-constant signal where each event's value holds
    * until the user's next event — the correct average for unevenly
    * sampled telemetry, where the row-mean over-weights bursty periods.
    *
    * Exactness: value is quantized to centi-units (the fixture's own
    * 2-decimal grid) as BIGINT, weighted by exact microsecond interval
    * lengths (unix_micros/epoch_us), and summed in BIGINT — the weighted
    * sum is bounded by max(v_q) * (the user's total observed span) =
    * 49_002 * 2.6e12 us ~ 1.3e17, inside int64 by ~70x, and the bound
    * scales with a USER's history span, not corpus size. The final twa =
    * wsum/total/100 runs the identical 3-op double chain in both
    * engines. One window (lead) and one aggregation, both keyed on
    * user_id — a scaling entity key. */
  def q146TimeWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("user_id") < 40)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("t_us"),
        expr("cast(round(value * 100) as bigint)").as("v_q"))
    val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    ev.withColumn("dt", lead("t_us", 1).over(w) - col("t_us"))
      .filter(col("dt").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).cast("bigint").as("n_segments"),
        sum("dt").cast("bigint").as("total_us"),
        sum(col("v_q") * col("dt")).as("wsum"))
      .select(col("user_id"), col("n_segments"), col("total_us"),
        (col("wsum").cast("double") / col("total_us").cast("double") /
          lit(100.0)).as("twa"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- q148

  /** Trailing-window anomaly detection over daily volumes: each
    * (event_type, day) count is z-scored against the mean/std of the 7
    * preceding CALENDAR days (never including itself — the monitoring
    * baseline convention), flagging volume spikes/dips. Round 11: the
    * daily summary densifies onto each type's q149-style day spine
    * (sequence+explode over the observed span, absent days coalesced
    * to count 0) BEFORE the window, so rowsBetween(-7, -1) is exactly
    * 7 calendar days even across gaps and a TOTAL-OUTAGE day now emits
    * a cnt=0 row that can flag as the dip it is (the round-10 board
    * documented the observed-days caveat; the spine removes it). The
    * reference's 7-day moving average (`aggregations.sql:36-42`) is
    * the mean half of this; the variance half makes it a detector.
    *
    * The scan collapses to per-(type, day) counts FIRST (one shuffle,
    * map-side combinable); the spine explode is narrow and bounded by
    * each type's span; the trailing window then rides ~|days| x
    * |types| summary rows (enum-partitioned over an aggregate — the
    * legal straggler-guard shape). Moments are exact BIGINT sums; the
    * z chain — mean = s1/7, var = (7*s2 - s1^2)/42, z = (c - mean)/
    * sqrt(var) — is the identical op sequence in both engines, and the
    * emitted z_e6 = floor(z * 1e6) quantizes the identical double.
    * Shared with q161's streaming twin ([[dayAnomaly]] is the same
    * object code over the stream's finalized daily summaries). */
  def q148DayAnomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("cnt"))
    dayAnomaly(daily)
  }

  /** The densify-then-z-score detector over a (event_type, d, cnt)
    * daily summary — q148's core, shared verbatim by q161. */
  private[graft] def dayAnomaly(daily: DataFrame): DataFrame = {
    val spine = daily.groupBy("event_type")
      .agg(min("d").as("d0"), max("d").as("d1"))
      .select(col("event_type"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("d"),
        lit(0L).as("cnt"))
    // densify by union+max rather than spine⟕daily: an observed day
    // carries (cnt, 0) -> max = cnt, an absent day only 0 — same rows,
    // one aggregate instead of a join (and no self-join of the summary
    // frame, which trips attribute dedup on streaming memory sinks)
    val dense = daily.select(col("event_type"), col("d"),
        col("cnt").cast("bigint").as("cnt"))
      .unionByName(spine)
      .groupBy("event_type", "d").agg(max("cnt").as("cnt"))
    val w7 = Window.partitionBy("event_type").orderBy("d").rowsBetween(-7, -1)
    dense
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("s1", sum("cnt").over(w7))
      .withColumn("s2", sum(col("cnt") * col("cnt")).over(w7))
      .filter(col("n7") === 7)
      .withColumn("mean", col("s1").cast("double") / lit(7.0))
      .withColumn("varr",
        (lit(7L) * col("s2") - col("s1") * col("s1")).cast("double") / lit(42.0))
      .filter(col("varr") > 0.0)
      .withColumn("z",
        (col("cnt").cast("double") - col("mean")) / sqrt(col("varr")))
      .select(col("event_type"), col("d"), col("cnt").cast("bigint").as("cnt"),
        floor(col("z") * lit(1000000.0)).cast("bigint").as("z_e6"))
      .orderBy("event_type", "d")
  }

  /** The detector's SQL twin, parameterized on the daily-summary CTE
    * name — shared by the q148 and q161 oracles so both engines run
    * the identical spine + window + z chain. */
  private[graft] def dayAnomalySql(dailyCte: String): String =
    s"""spans AS (SELECT event_type, MIN(d) AS d0, MAX(d) AS d1
       |  FROM $dailyCte GROUP BY event_type),
       |spine AS (SELECT event_type,
       |    CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d,
       |    CAST(0 AS BIGINT) AS cnt
       |  FROM spans),
       |dense AS (SELECT event_type, d, MAX(cnt) AS cnt FROM (
       |    SELECT event_type, d, CAST(cnt AS BIGINT) AS cnt FROM $dailyCte
       |    UNION ALL SELECT event_type, d, cnt FROM spine)
       |  GROUP BY event_type, d),
       |wins AS (SELECT event_type, d, cnt,
       |    COUNT(*) OVER w AS n7, SUM(cnt) OVER w AS s1,
       |    SUM(cnt * cnt) OVER w AS s2
       |  FROM dense
       |  WINDOW w AS (PARTITION BY event_type ORDER BY d
       |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
       |z AS (SELECT event_type, d, cnt,
       |    (CAST(cnt AS DOUBLE) - CAST(s1 AS DOUBLE) / 7.0)
       |      / sqrt(CAST(7 * s2 - s1 * s1 AS DOUBLE) / 42.0) AS z
       |  FROM wins WHERE n7 = 7
       |    AND CAST(7 * s2 - s1 * s1 AS DOUBLE) / 42.0 > 0.0)""".stripMargin

  // ---------------------------------------------------------------- q149

  /** Gap densification with forward fill: expand each user's observed
    * span to a dense daily spine (sequence+explode — the S12 generator
    * applied per-entity) and carry the last observed day-close value
    * across unobserved days (LOCF). Day-close is the value of the day's
    * LAST event under the total (ts, event_id) order — the q129
    * arg-selection rule, expressed as a struct max.
    *
    * Scale: the spine explode is narrow (one generator row per user-day,
    * bounded by span length per entity); the fill is last(ignoreNulls)
    * over the user_id entity key. No global operation anywhere — at
    * 100 TB this densifies each user independently. */
  def q149DensifyFfill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("user_id") < 30)
      .select(col("user_id"), col("ts").cast("date").as("d"), col("ts"),
        col("event_id"), col("value"))
    val daily = ev.groupBy("user_id", "d")
      .agg(max(struct(col("ts"), col("event_id"), col("value")))
        .getField("value").as("day_close"))
    val spine = ev.groupBy("user_id")
      .agg(min("d").as("d0"), max("d").as("d1"))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
    spine.join(daily, Seq("user_id", "d"), "left")
      .withColumn("filled", last("day_close", ignoreNulls = true)
        .over(Window.partitionBy("user_id").orderBy("d")))
      .select(col("user_id"), col("d"),
        col("day_close").isNotNull.as("observed"),
        expr("cast(round(filled * 100) as bigint)").as("filled_e2"))
      .orderBy("user_id", "d")
  }

  // ---------------------------------------------------------------- q159

  /** Day-of-week SEASONALITY INDEX per event type — each weekday's mean
    * daily volume relative to the type's overall mean daily volume, in
    * exact cross-multiplied integer arithmetic:
    * idx_e6 = floor(1e6 · cnt_dow · days_total / (days_dow · cnt_total)).
    * The decomposition half of q148's detector (q148 flags deviations
    * from a trailing baseline; this names the weekly rhythm those
    * deviations sit on — the reference's peak-hour histogram,
    * `aggregations.sql:29-34`, one calendar level up).
    *
    * Scale: the scan collapses to per-(type, day) counts first (one
    * map-side-combinable shuffle); everything after is arithmetic over
    * |types| x 7 summary rows, and the division never leaves the
    * integer lattice. */
  def q159SeasonalityIndex(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow", dayofweek(col("d")).cast("bigint"))
    val byDow = daily.groupBy("event_type", "dow")
      .agg(sum("cnt").as("cnt_dow"), count(lit(1)).as("days_dow"))
    val tot = daily.groupBy("event_type")
      .agg(sum("cnt").as("cnt_tot"), count(lit(1)).as("days_tot"))
    byDow.join(tot, Seq("event_type"))
      .select(col("event_type"), col("dow"),
        col("cnt_dow").cast("bigint").as("cnt_dow"),
        col("days_dow").cast("bigint").as("days_dow"),
        expr("(1000000 * cnt_dow * days_tot) div (days_dow * cnt_tot)")
          .cast("bigint").as("idx_e6"))
      .orderBy("event_type", "dow")
  }

  // ---------------------------------------------------------------- q164

  /** Native `session_window` sessionization (batch form) — Spark's
    * built-in gap-based session assignment, hash-checked against an
    * independent gaps-and-islands construction in the oracle (lag-gap
    * flags → running session ids → per-session bounds). The built-in
    * counterpart to q39's `flatMapGroupsWithState` sessionize: same
    * 30-minute gap, but expressed declaratively so Catalyst plans it as
    * an aggregation (and the same expression drops into a streaming
    * groupBy unchanged). Session end = last event + gap, the
    * session_window convention; a new session starts when the gap is
    * >= 30 min (windows are end-exclusive, so touching windows do NOT
    * merge — pinned by the oracle's `>=`).
    *
    * Scale: one shuffle on user_id (the entity key); per-group state is
    * the user's own session list. Timestamps format to whole seconds in
    * BOTH engines (q36 idiom), which only relabels — session identity
    * comes from the full-precision arithmetic. */
  def q164SessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).cast("bigint").as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  // ---------------------------------------------------------------- q165

  /** (user, week) ordered event-type-initial path — q165's sequence
    * compression, shared by the registered query and its test-only
    * round-9 baseline. */
  private[graft] def q165Paths(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("d", date_trunc("week", col("ts")).cast("date"))
      .groupBy("user_id", "d")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))),
          x => substring(x.getField("event_type"), 1, 1)),
        "").as("path"))

  /** q165's candidate pairs from the 1-DELETION NEIGHBORHOOD (the
    * SymSpell blocking): every path emits itself plus each
    * single-character-deletion variant as an md5 block key, and two
    * paths within edit distance 1 PROVABLY share a key — equal paths
    * share the identity key; a substitution at i makes del_i(a) =
    * del_i(b); a deletion/insertion makes the shorter string one of the
    * longer one's variants (and every string keys itself). So unlike
    * round 9's (first-initial × length-bucket) block — a bounded
    * alphabet whose membership grows linearly and candidate join
    * quadratically — the key is CONTENT: its cardinality grows with the
    * path diversity of the data, and the filter is lossless at radius
    * 1, not a recall trade. Keys are md5'd so the exchange carries
    * fixed-width values regardless of path length (a hash collision can
    * only add a false candidate, which the exact levenshtein verify
    * discards). Pair expansion rides [[DedupQueries.bucketPairs]]: one
    * shuffle on the key, sorted in-bucket expansion, distinct — never
    * all-pairs, and the id struct carries the path so scoring needs no
    * corpus re-join. */
  private[graft] def q165Candidates(s: SparkSession, dir: String): DataFrame = {
    val keyed = q165Paths(s, dir)
      .select(struct(col("user_id"), col("d"), col("path")).as("id"),
        // i=0 is the identity variant: substring(path, 1, -1) = '' and
        // substring(path, 1) = path, so the one lambda covers both
        explode(expr("array_distinct(transform(sequence(0, length(path)), " +
          "i -> md5(concat(substring(path, 1, i - 1), substring(path, i + 1)))))"))
          .as("bkey"))
      .withColumn("band", lit(0))
    DedupQueries.bucketPairs(keyed, "id", "a", "b")
  }

  /** Behavior-clone detection: (user, week) event sequences with
    * near-identical shape across DIFFERENT users — the bot/script
    * signature hunt, which is sequence near-dedup (the q21/q22 dedup
    * discipline applied to q122-style assembled paths instead of
    * document text). Each user-week compresses to its ordered
    * event-type initial string; candidate pairs come from the
    * [[q165Candidates]] deletion-neighborhood blocking — complete at
    * radius 1 — and only candidates pay the codegen'd levenshtein.
    * Output: the EXACT global top-20 closest pairs under the total
    * (distance, keys) order, whenever at least 20 pairs sit within
    * radius 1 (the fixture has 200+; TemporalSpec asserts it), which is
    * why the oracle is plain mirrored brute force rather than a twin of
    * the blocking arithmetic.
    *
    * Scale: path assembly is one user-week shuffle (entity keys);
    * deletion keys are linear in corpus size (len+1 fixed-width hashes
    * per path); the only quadratic is inside real duplicate groups —
    * pair-output-sized, the same inherent cost as q21's exact-dup
    * groups. */
  def q165BehaviorClones(s: SparkSession, dir: String): DataFrame =
    q165Candidates(s, dir)
      .filter(col("a.user_id") < col("b.user_id"))
      .withColumn("dist", levenshtein(col("a.path"), col("b.path")))
      .filter(col("dist") <= 1)
      .select(col("a.user_id").cast("bigint").as("user_a"),
        col("a.d").as("day_a"),
        col("b.user_id").cast("bigint").as("user_b"),
        col("b.d").as("day_b"),
        length(col("a.path")).cast("int").as("len_a"),
        col("dist").cast("int").as("dist"))
      .orderBy(asc("dist"), asc("user_a"), asc("day_a"), asc("user_b"),
        asc("day_b"))
      .limit(20)

  /** Round-9's registered q165, kept TEST-ONLY: the (first-initial ×
    * length-bucket) blocking key is a bounded alphabet (~5 × ~25 blocks
    * total), so per-block membership grows linearly with users and the
    * within-block candidate join quadratically — ~10,000× the pair work
    * at 100× the data. TemporalSpec proves the deletion-neighborhood
    * candidates are a superset of this form's top-20 on the fixture. */
  private[graft] def behaviorClonesAlphabetBlocked(s: SparkSession,
      dir: String): DataFrame = {
    val paths = q165Paths(s, dir)
      .withColumn("blk_len", expr("length(path) div 4"))
      .withColumn("blk_c", expr("substring(path, 1, 1)"))
    val a = paths.select(col("blk_len"), col("blk_c"),
      col("user_id").as("ua"), col("d").as("da"), col("path").as("pa"))
    val b = paths.select(col("blk_len"), col("blk_c"),
      col("user_id").as("ub"), col("d").as("db"), col("path").as("pb"))
    a.join(b, Seq("blk_len", "blk_c"))
      .filter(col("ua") < col("ub"))
      .withColumn("dist", levenshtein(col("pa"), col("pb")))
      .select(col("ua").cast("bigint").as("user_a"), col("da").as("day_a"),
        col("ub").cast("bigint").as("user_b"), col("db").as("day_b"),
        length(col("pa")).cast("int").as("len_a"), col("dist").cast("int").as("dist"))
      .orderBy(asc("dist"), asc("user_a"), asc("day_a"), asc("user_b"),
        asc("day_b"))
      .limit(20)
  }

  // ---------------------------------------------------------------- q173

  /** FLOOR-CAPPED running balance per user — bal_t = max(0, bal_{t-1} +
    * delta_t) — the inventory/credit recurrence that is genuinely
    * NON-ASSOCIATIVE: no window frame or prefix sum computes it,
    * because the clamp couples every step to the previous state. The
    * scale-correct Spark form is a per-entity ORDERED FOLD: each user's
    * deltas collect into a (ts, event_id)-sorted array (bounded by
    * per-entity activity — the sessionize assumption) and a codegen'd
    * `aggregate` higher-order fold applies the clamp sequentially
    * in-row. One shuffle on user_id; the sequential dependency never
    * leaves a single row.
    *
    * Credits (signup/view/click) add the centi-quantized value, debits
    * (purchase/error) subtract it; both engines fold the identical
    * integer recurrence (DuckDB's list_reduce seeds from the first
    * element, so the oracle prepends the 0 initial state). */
  def q173CappedBalance(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("user_id") < 60)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type").isin("purchase", "error"),
          -expr("cast(round(value * 100) as bigint)"))
          .otherwise(expr("cast(round(value * 100) as bigint)")).as("delta"))
      .groupBy("user_id")
      .agg(count(lit(1)).cast("bigint").as("n_events"),
        sum("delta").cast("bigint").as("net_sum"),
        expr("""aggregate(
          transform(
            array_sort(collect_list(struct(ts, event_id, delta))),
            x -> x.delta),
          0L, (acc, d) -> greatest(0L, acc + d))""").as("final_balance"))
      .select(col("user_id"), col("n_events"), col("net_sum"),
        col("final_balance").cast("bigint").as("final_balance"))
      .orderBy("user_id")

  // ---------------------------------------------------------------- q175

  /** HALF-LIFE decayed engagement score per user — recency weighting
    * WITHOUT transcendentals: exp-decay's engine-divergent pow/exp (the
    * q75/q163 ban) is replaced by the exact dyadic form w = 1e6 >> k,
    * k = min(age_weeks, 20) — a 1-week half-life on the integer
    * lattice. Every product and sum is BIGINT-exact, so the ranking a
    * recommender would consume is bit-stable across engines and
    * cluster runs. The anchor is one bounded driver scalar (the q19
    * mirror class); the rest is one scan and one entity-key shuffle. */
  def q175DecayScore(s: SparkSession, dir: String): DataFrame = {
    // the anchor used to be a separate driver action (its own full
    // events scan + job); the consumer chain references events exactly
    // ONCE, so the anchor rides the main action as a broadcast 1-row
    // aggregate instead (the q188/q200 crossJoin fold) — same two scans,
    // one job instead of two
    val anchor = Tables.events(s, dir)
      .agg(max(expr("unix_micros(ts)")).as("anchor_us"))
    Tables.events(s, dir).filter(col("user_id") < 60)
      .crossJoin(broadcast(anchor))
      .withColumn("k",
        expr("least((anchor_us - unix_micros(ts)) div 604800000000L, 20L)"))
      .withColumn("contrib",
        expr("cast(round(value * 100) as bigint)") *
          expr("shiftright(1000000L, cast(k as int))"))
      .groupBy("user_id")
      .agg(count(lit(1)).cast("bigint").as("n_events"),
        sum("contrib").cast("bigint").as("score_e8"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- q179

  /** Day-over-day DISTRIBUTION drift — q174's exact KS statistic run as
    * a daily monitor: each day's value distribution against the
    * previous day's, over a dense generated bucket grid so the two
    * CDFs align at every comparison point. The continuous-monitoring
    * form of the drift gate (q174 compares two cohorts once; this
    * watches a stream of days).
    *
    * Exactness: per-(day, bucket) integer counts, cumulative sums over
    * the generated grid (windows per day over bounded bucket summaries
    * — aggregate/generator beneath), and the sup over cross-multiplied
    * BIGINTs; one division per emitted day. The bucket grid is the
    * value domain's size, not the event count — generation cost is
    * |days| x |buckets|. Grid bounds derive from the data's own
    * min/max floor(value) (one bounded scalar pass — no hard-coded
    * domain): ANY grid covering every observed bucket yields the
    * identical per-day D, because cells below the min carry zero
    * counts and cells above the max pin both CDFs at their totals
    * (dnum = |n·n_p − n_p·n| = 0), so the result is invariant under
    * the bound choice and the oracle needs no mirror of it. */
  def q179DailyDrift(s: SparkSession, dir: String): DataFrame =
    dailyKs(Tables.events(s, dir)
      .groupBy(col("ts").cast("date").as("d"),
        expr("cast(floor(value) as bigint)").as("vb"))
      .agg(count(lit(1)).as("c")))

  /** The day-over-day KS arithmetic over a (d, vb, c) bucket-count
    * frame — shared by q179 (batch counts) and q186 (stream-finalized
    * counts): dense covering grid from the frame's own vb bounds (one
    * bounded scalar pass), per-day cumulative windows over grid-sized
    * summaries, exact cross-multiplied sup per adjacent-day pair. */
  private[graft] def dailyKs(counts: DataFrame): DataFrame = {
    val b = counts.agg(min("vb").as("lo"), max("vb").as("hi")).head()
    require(!b.isNullAt(0), "dailyKs: no bucket counts")
    val (gLo, gHi) = (b.getLong(0), b.getLong(1))
    val days = counts.select("d").distinct()
    val grid = days.select(col("d"),
      explode(expr(s"sequence(${gLo}L, ${gHi}L)")).as("vb"))
    val cdf = grid.join(counts, Seq("d", "vb"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum", sum("c").over(
        Window.partitionBy("d").orderBy("vb")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum("c").over(Window.partitionBy("d")))
      .select("d", "vb", "cum", "n")
    val prev = cdf.select(expr("date_add(d, 1)").as("d"), col("vb"),
      col("cum").as("cum_p"), col("n").as("n_p"))
    cdf.join(prev, Seq("d", "vb"))
      .withColumn("dnum", abs(col("cum") * col("n_p") - col("cum_p") * col("n")))
      .groupBy("d")
      .agg(first("n").as("n_day"), first("n_p").as("n_prev"),
        max("dnum").as("d_num"))
      .select(col("d"), col("n_day").cast("bigint").as("n_day"),
        col("n_prev").cast("bigint").as("n_prev"),
        col("d_num").cast("bigint").as("d_num"),
        (col("d_num").cast("double") /
          (col("n_day") * col("n_prev")).cast("double")).as("ks"))
      .orderBy("d")
  }

  // ---------------------------------------------------------------- q180

  /** Funnel CONVERSION LATENCY — time from a user's first view to their
    * first subsequent purchase, with the population median computed by
    * the q138 two-phase selection (bucketed on hours) rather than a
    * buffering percentile: per-user latencies scale with the user
    * population, so the selection discipline applies even though the
    * output is one row. Closes q103's ordered-funnel counting with the
    * "how long does conversion take" half.
    *
    * Exactness: microsecond BIGINT latencies; mean = sum/count is one
    * mirrored double division; the median is assembled from exact rank
    * values with the (lo + hi) / 2 arithmetic. */
  def q180FunnelLatency(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(expr("unix_micros(ts)")).as("tv"))
    val lat = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts)").as("tp"))
      .join(firstView, Seq("user_id"))
      .filter(col("tp") > col("tv"))
      .groupBy("user_id").agg((min(col("tp")) - first(col("tv"))).as("lat_us"))
    val base = lat.select(col("lat_us").as("v"))
      .withColumn("vb", expr("v div 3600000000"))
    val wOff = Window.orderBy("vb").rowsBetween(Window.unboundedPreceding, -1)
    val summaries = base.groupBy("vb").agg(count(lit(1)).as("bc"))
      .withColumn("off", coalesce(sum("bc").over(wOff), lit(0L)))
      .withColumn("n", sum("bc").over(Window.partitionBy()))
    val targets = summaries
      .withColumn("rlo", expr("(n + 1) div 2"))
      .withColumn("rhi", expr("n div 2 + 1"))
      .filter((col("off") < col("rlo") && col("rlo") <= col("off") + col("bc")) ||
              (col("off") < col("rhi") && col("rhi") <= col("off") + col("bc")))
      .select("vb", "off", "rlo", "rhi")
    val wIntra = Window.partitionBy("vb").orderBy("v")
    val med = base.join(broadcast(targets), Seq("vb"))
      .withColumn("rn", col("off") + row_number().over(wIntra))
      .filter(col("rn") === col("rlo") || col("rn") === col("rhi"))
      .agg(((min(when(col("rn") === col("rlo"), col("v"))) +
             min(when(col("rn") === col("rhi"), col("v")))) / 2.0)
        .as("median_latency_us"))
    val stats = lat.agg(count(lit(1)).cast("bigint").as("n_converted"),
      sum("lat_us").cast("bigint").as("sum_lat_us"))
    val nv = firstView.agg(count(lit(1)).cast("bigint").as("n_viewers"))
    nv.crossJoin(stats).crossJoin(med)
      .select(col("n_viewers"), col("n_converted"),
        (col("sum_lat_us").cast("double") / col("n_converted").cast("double"))
          .as("mean_latency_us"),
        col("median_latency_us"))
  }

  // ---------------------------------------------------------------- q181

  /** LAG-1 AUTOCORRELATION of daily volumes per event type — how much
    * today's traffic predicts tomorrow's, the one-number summary of
    * q159's weekly rhythm and the stationarity check behind q148's
    * trailing baseline. Pearson r over (x_t, x_{t-1}) day pairs in the
    * q110 discipline: every moment is an exact BIGINT sum over day
    * summaries; r's numerator/denominator chain runs identically in
    * both engines, floor-quantized to e6. */
  def q181Autocorrelation(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("cnt"))
    val prev = daily.select(col("event_type"),
      expr("date_add(d, 1)").as("d"), col("cnt").as("y"))
    daily.join(prev, Seq("event_type", "d"))
      .select(col("event_type"), col("cnt").as("x"), col("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("n").cast("bigint").as("n_pairs"),
        floor(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
                 (col("n") * col("syy") - col("sy") * col("sy")).cast("double")) *
            lit(1000000.0))
          .cast("bigint").as("r_e6"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q189

  /** FIRST-ORDER MARKOV TRANSITION MATRIX over per-user event
    * sequences — P(next event type | current), the behavioral model
    * behind q145's assembled paths and the structural summary a
    * bot-detection or next-action feature reads. Each user's events
    * order by the total (ts, event_id) key; consecutive pairs count
    * into the |types|² matrix; each row's probabilities are one
    * mirrored division over the bounded matrix frame.
    *
    * Scale: ONE shuffle on user_id for the lag window (a scaling
    * entity key — per-user sequences, never a global sort), then a
    * map-side-combinable aggregate onto the enum² matrix; the share
    * window partitions the 25-row summary by from_type (enum key over
    * an aggregate — the legal straggler-guard shape). */
  def q189TransitionMatrix(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("to_type"))
      .withColumn("from_type", lag("to_type", 1).over(w))
      .filter(col("from_type").isNotNull)
    pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("row_n", sum("n").over(Window.partitionBy("from_type")))
      .select(col("from_type"), col("to_type"), col("n").cast("bigint").as("n"),
        floor(col("n").cast("double") / col("row_n").cast("double")
          * lit(1000000.0)).cast("bigint").as("p_e6"))
      .orderBy("from_type", "to_type")
  }

  // ---------------------------------------------------------------- q196

  /** SESSION ENTRY/EXIT MATRIX with bounce counts — which event type
    * opens a session, which closes it, and how many sessions are
    * single-event bounces: the product-analytics readout q164's
    * session identity exists to feed. Sessions are the native
    * `session_window` (30-minute gap, the q164 construction whose
    * parity against an independent gaps-and-islands oracle is already
    * hash-proven); each session's ordered event list collapses in the
    * SAME aggregate via one array_sort(collect_list) — entry and exit
    * are its first/last elements under the total (ts, event_id) order,
    * so no second window pass runs. Per-entity session state bounds
    * the collected list (the q173 sessionize assumption).
    *
    * Output: per (entry, exit) pair — session count, bounce count, and
    * the e6-floored bounce share (one mirrored division). */
  def q196SessionEntryExit(s: SparkSession, dir: String): DataFrame = {
    val sessions = Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(expr("array_sort(collect_list(struct(ts, event_id, event_type)))")
        .as("evs"))
      .select(expr("evs[0].event_type").as("entry_type"),
        expr("element_at(evs, -1).event_type").as("exit_type"),
        expr("size(evs)").as("n"))
    sessions.groupBy("entry_type", "exit_type")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_bounces"))
      .select(col("entry_type"), col("exit_type"),
        col("n_sessions").cast("bigint").as("n_sessions"),
        col("n_bounces").cast("bigint").as("n_bounces"),
        floor(col("n_bounces").cast("double") /
          col("n_sessions").cast("double") * lit(1000000.0))
          .cast("bigint").as("bounce_share_e6"))
      .orderBy("entry_type", "exit_type")
  }

  // ---------------------------------------------------------------- q197

  /** THEIL–SEN robust trend per event type — the median of all
    * pairwise day-slopes, the estimator that shrugs off the outlier
    * days that bend an OLS line (the robust counterpart to q181's
    * Pearson moments, as q152's MAD is to the stddev). Slopes are
    * RATIONALS (Δcount/Δindex); each maps to an exact BIGINT sort key
    * by offset-then-quantize — (dp + 10⁶·dq)·10⁹ div dq — where the
    * offset keeps the numerator positive (daily counts < 10⁶, asserted
    * in EvalWaveSpec) so BIGINT truncation equals floor in BOTH
    * engines (Spark `div` truncates toward zero, DuckDB `//` floors —
    * the q182 dialect edge, sidestepped the same way), and the key is
    * monotone in the true slope to 1e-9. Median selection reads values
    * at the two middle ranks, so equal-key ties cannot perturb it.
    *
    * Scale: pairs are quadratic in OBSERVED DAYS (time, not corpus —
    * ~365·years rows per type), generated from the per-(type, day)
    * summary self-join; every window rides that summary-derived frame
    * partitioned by type. */
  def q197TheilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("c"))
      .withColumn("i", row_number().over(
        Window.partitionBy("event_type").orderBy("d")).cast("long"))
    val a = daily.select(col("event_type"), col("i").as("ia"), col("c").as("ca"))
    val b = daily.select(col("event_type"), col("i").as("ib"), col("c").as("cb"))
    val slopes = a.join(b, Seq("event_type"))
      .filter(col("ib") > col("ia"))
      .select(col("event_type"),
        expr("((cb - ca + 1000000L * (ib - ia)) * 1000000000L) div (ib - ia)")
          .as("k"))
    val w = Window.partitionBy("event_type").orderBy("k")
    val ranked = slopes
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
    ranked
      .filter(col("rn") === expr("(n + 1) div 2") ||
        col("rn") === expr("n div 2 + 1"))
      .groupBy("event_type")
      .agg(first("n").as("n"),
        min(when(col("rn") === expr("(n + 1) div 2"), col("k"))).as("klo"),
        min(when(col("rn") === expr("n div 2 + 1"), col("k"))).as("khi"))
      .select(col("event_type"), col("n").cast("bigint").as("n_pairs"),
        (col("klo") - lit(1000000000000000L)).cast("bigint").as("slope_lo_e9"),
        (col("khi") - lit(1000000000000000L)).cast("bigint").as("slope_hi_e9"),
        (((col("klo") - lit(1000000000000000L)).cast("double") +
          (col("khi") - lit(1000000000000000L)).cast("double")) / lit(2.0))
          .as("slope_e9"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q198

  /** AUTOCORRELATION PANEL — q181's lag-1 Pearson generalized to the
    * full ACF at lags 1..7 in ONE pass: the seasonality fingerprint a
    * forecaster reads (a weekly rhythm shows as a lag-7 peak — q159's
    * index, restated as correlations). Each day's count joins its
    * lag-k partner by calendar date (a zero-event day simply produces
    * no pair — the q148 observed-day convention), moments accumulate
    * per (type, lag) as exact BIGINTs over day summaries, and each
    * r_e6 is the identical q181 floor-quantized chain.
    *
    * Scale: the lag explode multiplies the DAY SUMMARY frame by 7,
    * not the event scan; one map-side-combinable aggregate per
    * (type, lag) follows. */
  def q198AcfPanel(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("c"))
    val shifted = daily
      .select(col("event_type"), col("d"), col("c").as("y"),
        explode(expr("sequence(1, 7)")).as("lag"))
      .select(col("event_type"), expr("date_add(d, lag)").as("d"),
        col("lag"), col("y"))
    daily.join(shifted, Seq("event_type", "d"))
      .select(col("event_type"), col("lag"), col("c").as("x"), col("y"))
      .groupBy("event_type", "lag")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("lag").cast("int").as("lag"),
        col("n").cast("bigint").as("n_pairs"),
        floor(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
                 (col("n") * col("syy") - col("sy") * col("sy")).cast("double")) *
            lit(1000000.0))
          .cast("bigint").as("r_e6"))
      .orderBy("event_type", "lag")
  }

  // ---------------------------------------------------------------- q208

  /** INTERVAL-OVERLAP JOIN by bucket-and-verify — the join geometry Spark
    * has no native operator for (a range predicate between two interval
    * sets plans as BroadcastNestedLoopJoin or a cartesian product, both
    * quadratic): per-(user, day) activity spans [min ts, max ts] joined
    * to global "incident" hours (hours whose volume is ≥ 1.5× the mean
    * hourly volume — the exact-integer form 2·cnt·H ≥ 3·T), emitting per
    * span the count of incident hours it overlaps and the exact overlap
    * microseconds.
    *
    * The scale pattern: each span EXPLODES into the hour buckets it
    * touches (bounded by span length / bucket width + 1 — here ≤ 25),
    * the bucket becomes an EQUI-join key, and the exact range predicate
    * verifies after the hash join. Bucketing is the coarse filter, the
    * predicate is the truth — the plan is a hash join plus a bounded
    * explode instead of a nested loop over |spans| × |hours|. Here the
    * incident side is bounded (hours in the retention window), so it
    * BROADCASTS and the span side never shuffles for the join at all;
    * the only exchange is the final per-(user, day) re-aggregation,
    * map-side combinable. Were both sides corpus-scale, the same
    * construction shuffles on the bucket key — a scaling key with
    * bounded per-key expansion. IntervalJoinSpec proves the bucketed
    * form == the brute-force range-predicate join and that the plan
    * contains no nested-loop or cartesian node.
    *
    * Overlap arithmetic is closed-interval, BIGINT-exact:
    * least(a1, h+1h) − greatest(a0, h) in unix microseconds (0 for a
    * single-point span inside the hour — counted, zero width). */
  def q208IntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val spans = ev.groupBy(col("user_id"), col("ts").cast("date").as("d"))
      .agg(min("ts").as("a0"), max("ts").as("a1"))
    val hourly = ev.groupBy(date_trunc("HOUR", col("ts")).as("h"))
      .agg(count(lit(1)).as("cnt"))
    bucketedOverlap(spans, incidentHours(hourly))
  }

  /** Hours whose volume is ≥ 1.5× the mean hourly volume, as exact
    * integers (2·cnt·H ≥ 3·T). T and H are BOUNDED DRIVER SCALARS (two
    * values over the bounded hour summary — the q150 idiom; a totals
    * cross join would put a 1-row BroadcastNestedLoopJoin in the plan,
    * and Catalyst folds a constant-key hash join right back into one).
    * The threshold is a monitoring constant, so folding it to literals
    * keeps the incident filter a pure predicate. */
  private[graft] def incidentHours(hourly: DataFrame): DataFrame = {
    val r = hourly.agg(sum("cnt"), count(lit(1))).first()
    val (t, nh) = (r.getLong(0), r.getLong(1))
    hourly.filter(col("cnt") * lit(nh) * lit(2L) >= lit(t) * lit(3L))
      .select(col("h"))
  }

  /** The bucket-and-verify core over a (user_id, d, a0, a1) span frame
    * and a bounded incident-hour frame — shared by q208 and its spec's
    * brute-force comparison. */
  private[graft] def bucketedOverlap(spans: DataFrame, incidents: DataFrame): DataFrame =
    spans.select(col("user_id"), col("d"), col("a0"), col("a1"),
        explode(expr(
          "sequence(date_trunc('HOUR', a0), date_trunc('HOUR', a1), interval 1 hour)"))
          .as("h"))
      .join(broadcast(incidents), Seq("h"))
      // exact verify: redundant when the bucket equals the B interval (as
      // here), load-bearing whenever buckets are coarser — always stated
      .filter(col("a0") < col("h") + expr("interval 1 hour") && col("h") <= col("a1"))
      .groupBy("user_id", "d")
      .agg(count(lit(1)).cast("bigint").as("n_inc_hours"),
        sum(least(unix_micros(col("a1")), unix_micros(col("h")) + lit(3600000000L))
          - greatest(unix_micros(col("a0")), unix_micros(col("h"))))
          .cast("bigint").as("overlap_us"))
      .select(col("user_id").cast("bigint").as("user_id"), col("d"),
        col("n_inc_hours"), col("overlap_us"))
      .orderBy("user_id", "d")

  // ---------------------------------------------------------------- q216

  /** q216 — trailing-7-day EXACT distinct active users per (event_type,
    * day): the sliding-window COUNT DISTINCT neither engine's window
    * frame can express (DISTINCT aggregates are unsupported OVER a
    * frame in both Spark and DuckDB), decomposed into shuffles that all
    * carry scaling keys:
    *   1. distinct (type, user, activity-day) — collapses the event
    *      stream to at most one row per user-day (map-side combine);
    *   2. a BOUNDED explode of each activity day to the 7 window ends
    *      it can serve (fanout = window length, a constant — never a
    *      row-count-dependent generate);
    *   3. distinct (type, user, window-end) — a user active on several
    *      days inside one window still counts once;
    *   4. count per (type, window-end), semi-joined back to days that
    *      actually had events so the spine never outruns the data.
    * The alternative single-window form (collect a 7-day user set per
    * day) buffers unbounded user lists per partition; this shape's
    * state is one row per (user, day) — the board's two-phase window
    * discipline applied to DISTINCT.
    *
    * Scale: shuffles 1 and 3 are partial-aggregated distincts on
    * (type, user, day) — at 100 TB the 7x fanout of step 2 happens
    * AFTER the first collapse, so it multiplies user-days, not events.
    * No window function at all; every aggregate is hash-based. */
  def q216SlidingDistinct(s: SparkSession, dir: String): DataFrame = {
    val ed = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"),
        col("ts").cast("date").as("d"))
      .distinct()
    val days = ed.select("event_type", "d").distinct()
    val covered = ed
      .select(col("event_type"), col("user_id"), col("d"),
        explode(expr("sequence(0, 6)")).as("off"))
      .select(col("event_type"), col("user_id"),
        expr("date_add(d, off)").as("d"))
      .distinct()
    covered
      .join(days, Seq("event_type", "d"), "left_semi")
      .groupBy("event_type", "d")
      .agg(count(lit(1)).cast("bigint").as("active_users_7d"))
      .orderBy("event_type", "d")
  }

  // ---------------------------------------------------------------- q231

  /** q231 — trailing-7-day sliding MEDIAN of event value per (type,
    * day): the robust sibling of q08's RANGE-frame moving average. A
    * frame-median exists in both engines only as a per-ROW recompute
    * (each output row re-sorts its whole frame — O(rows x window) and
    * a single partition per type), so the registered form computes
    * each WINDOW ONCE: q216's bounded 7-day fanout routes every event
    * to the (<=7) window-ends it serves, one hash aggregate per (type,
    * window-end) takes the exact interpolated median, and the
    * window-end spine is semi-joined to days that had events so the
    * fanout never outruns the data. The fanout multiplies the event
    * stream by a CONSTANT (the window length), after which everything
    * shuffles on scaling keys.
    *
    * `percentile` here is exact (it buffers the group — the q96
    * caveat) and bit-identical to DuckDB's quantile_cont (the q49-
    * proven interpolating pair); when a (type, day) group stops
    * fitting, q100's binned estimate or q51's GK sketch is the same
    * decomposition with fixed state — the fanout is the part that
    * carries over unchanged. */
  def q231SlidingMedian(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("value"), col("ts").cast("date").as("d"))
    val days = ev.select("event_type", "d").distinct()
    ev.select(col("event_type"), col("value"),
        explode(expr("sequence(0, 6)")).as("off"), col("d"))
      .select(col("event_type"), col("value"), expr("date_add(d, off)").as("d"))
      .join(days, Seq("event_type", "d"), "left_semi")
      .groupBy("event_type", "d")
      .agg(count(lit(1)).cast("bigint").as("n_7d"),
        expr("percentile(value, 0.5)").as("median_7d"))
      .orderBy("event_type", "d")
  }

  // ---------------------------------------------------------------- q237

  /** q237 — trailing-7-day rolling CROSS-correlation matrix over the
    * event-type daily-volume series (the co-movement monitor next to
    * q198's autocorrelation and q179's drift: "did errors start moving
    * with purchases this week?"). For every unordered type pair and
    * every day, the exact Pearson correlation of the two types' daily
    * counts over the trailing 7 days.
    *
    * Shape: one (type, day) count aggregate — the only corpus-sized
    * pass — densified onto the distinct-types × distinct-days grid
    * (missing days count 0, so series align by calendar, not by
    * presence), one equi-join on the day index pairing the grid with
    * itself (grid rows = |types|·|days|, bounded summaries), and ONE
    * (ta, tb)-partitioned RANGE window carrying all five moment sums —
    * a range frame over the integer epoch-day, so calendar gaps in the
    * spine can never silently widen the window.
    *
    * Determinism: every moment (n, Σa, Σb, Σa², Σb², Σab) is an exact
    * BIGINT window sum; the correlation numerator and both variance
    * terms are exact integer combinations of them; the only float work
    * is the final cast-sqrt-divide-floor chain, the identical IEEE op
    * sequence in both engines (the q188 rule: cross-products of
    * independent counts get doubles — sqrt(d1)·sqrt(d2), never the
    * BIGINT product d1·d2, which would overflow first). Exactness
    * headroom: with per-day counts c, the moments are ≤ 49c² —
    * cast-to-double-exact past c ~ 1e7 per day per type. */
  def q237RollingCorrelation(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type").as("t"), col("ts").cast("date").as("d"))
    val days = ev.select("d").distinct()
    val types = ev.select("t").distinct()
    val cnt = ev.groupBy("t", "d").agg(count(lit(1)).as("c"))
    val grid = types.crossJoin(days)
      .join(cnt, Seq("t", "d"), "left")
      .select(col("t"), col("d"),
        expr("datediff(d, date'1970-01-01')").as("di"),
        coalesce(col("c"), lit(0L)).as("c"))
    val a = grid.select(col("t").as("ta"), col("d"), col("di"),
      col("c").as("ca"))
    val b = grid.select(col("t").as("tb"), col("di").as("di2"),
      col("c").as("cb"))
    val w = Window.partitionBy("ta", "tb").orderBy("di").rangeBetween(-6, 0)
    a.join(b, col("di") === col("di2") && col("ta") < col("tb"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sa", sum("ca").over(w))
      .withColumn("sb", sum("cb").over(w))
      .withColumn("saa", sum(expr("ca * ca")).over(w))
      .withColumn("sbb", sum(expr("cb * cb")).over(w))
      .withColumn("sab", sum(expr("ca * cb")).over(w))
      .select(col("ta"), col("tb"), col("d"),
        col("n").cast("bigint").as("n_days"),
        expr("case when n*saa - sa*sa > 0 and n*sbb - sb*sb > 0 then " +
          "cast(floor(cast(n*sab - sa*sb as double) " +
          "/ (sqrt(cast(n*saa - sa*sa as double)) " +
          "* sqrt(cast(n*sbb - sb*sb as double))) * 1e6) as bigint) end")
          .as("corr7_e6"))
      .orderBy("ta", "tb", "d")
  }

  // ---------------------------------------------------------------- q224

  /** q224 — LIFETIME cumulative distinct users per (event_type, day):
    * the unbounded-window sibling of q216's trailing distinct, via the
    * FIRST-OCCURRENCE trick — a user contributes to every day from
    * their first activity on, so the cumulative distinct count at day
    * d is simply the running sum of "users whose first day is d":
    *   1. min activity day per (type, user) — one shuffle, map-side
    *      combined;
    *   2. count first-days per (type, day) — the summary frame;
    *   3. one running-sum window over SUMMARIES (|days| rows per type,
    *      the q148 day-spine discipline), densified onto the active-day
    *      spine so days with no new users still report.
    * No fanout at all (unlike the trailing window, an unbounded window
    * never needs one), no distinct state beyond the user-day collapse.
    * The oracle is the INDEPENDENT formulation — a correlated
    * COUNT(DISTINCT) over every prefix — so the equivalence of the
    * first-occurrence decomposition is what the hash check proves. */
  def q224CumulativeDistinct(s: SparkSession, dir: String): DataFrame = {
    val ed = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"), col("ts").cast("date").as("d"))
    val first = ed.groupBy("event_type", "user_id").agg(min("d").as("d"))
    val newPerDay = first.groupBy("event_type", "d")
      .agg(count(lit(1)).as("nn"))
    val days = ed.select("event_type", "d").distinct()
    val w = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(newPerDay, Seq("event_type", "d"), "left")
      .withColumn("nn", coalesce(col("nn"), lit(0L)))
      .withColumn("lifetime_users", sum("nn").over(w).cast("bigint"))
      .select(col("event_type"), col("d"),
        col("nn").cast("bigint").as("n_new"), col("lifetime_users"))
      .orderBy("event_type", "d")
  }

  // ---------------------------------------------------------------- q239

  /** q239 — multi-touch LINEAR ATTRIBUTION with exact proration: every
    * purchase's cents split EQUALLY across the user's clicks in the
    * trailing 7 days (the marketing-analytics workhorse between q180's
    * first-touch funnel and q175's decay scoring), with the split kept
    * exact by q153's largest-remainder arithmetic — each touch gets
    * vc div k, and the vc mod k leftover cents go to the k earliest
    * touches one cent each, so per-purchase conservation
    * (Σ attributed == vc) holds as an integer identity, never a float
    * rounding hope. All operands are non-negative, so div/mod agree
    * across engines (the posmod discipline's cheap case).
    *
    * Shape: one user-keyed equi-join carrying the event-time range
    * predicate (purchase×click fanout per user is bounded by per-user
    * activity — the q132 key-fanout rule; a user-unbounded variant
    * would ride q208's bucket-and-verify instead), two windows over
    * the SAME purchase-id partition (one shuffle: the touch count and
    * the tie-broken touch rank), one user-level rollup. */
  def q239LinearAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
        col("ts").as("pts"),
        expr("cast(round(value * 100) as bigint)").as("vc"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("cid"), col("ts").as("cts"))
    val wk = Window.partitionBy("pid")
    val wr = Window.partitionBy("pid").orderBy("cts", "cid")
    p.join(c, Seq("user_id"))
      .filter(col("cts") <= col("pts") &&
        col("cts") >= expr("pts - INTERVAL 7 DAY"))
      .withColumn("k", count(lit(1)).over(wk))
      .withColumn("rnk", row_number().over(wr))
      .withColumn("att", expr(
        "vc div k + case when rnk <= vc % k then 1 else 0 end"))
      .groupBy("user_id")
      .agg(countDistinct("pid").cast("bigint").as("n_purchases"),
        count(lit(1)).cast("bigint").as("n_touches"),
        sum("att").cast("bigint").as("attributed_cents"))
      .orderBy("user_id")
  }

  // ------------------------------------------------------------ registry

  // ---------------------------------------------------------------- q264

  /** q264 — BURSTINESS (Fano factor) per event type: the
    * variance-to-mean ratio of DAILY counts over each type's densified
    * calendar span — the overdispersion readout that separates a
    * Poisson-ish steady stream (fano ≈ 1) from a bursty one (≫ 1) and
    * from a quota-throttled one (< 1); capacity planning and anomaly-
    * threshold tuning (q148/q161's z-cuts) both key off it. Densifying
    * onto the q149 day spine is load-bearing: a type with silent days
    * is exactly the bursty case, and dropping its zero days biases the
    * mean up and the variance down.
    *
    * Exact arithmetic: fano = var/mean = (n·Σx² − S²) / ((n−1)·S) over
    * BIGINT daily counts, e6-floored; the numerator is non-negative by
    * Cauchy–Schwarz so trunc == floor in both engines. Headroom:
    * 1e6·n·Σx² — exact to ~3e3 days of ~2e4-event days at 1e6 scale
    * (fixture ~30×2e4); decimal(38,0) past that (the q187 note).
    *
    * Scale shape: one map-side-combinable (type, day) count, a bounded
    * per-type spine explode (q149's), one bounded-enum rollup. No
    * windows, no joins. */
  def q264Burstiness(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"), expr("cast(ts as date)").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
    val spine = daily.groupBy("event_type")
      .agg(min("d").as("d0"), max("d").as("d1"))
      .select(col("event_type"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("d"),
        lit(0L).as("cnt"))
    val dense = daily
      .select(col("event_type"), col("d"), col("cnt").cast("bigint").as("cnt"))
      .unionByName(spine)
      .groupBy("event_type", "d").agg(max("cnt").as("cnt"))
    dense.groupBy("event_type")
      .agg(count(lit(1)).cast("bigint").as("n_days"),
        sum("cnt").cast("bigint").as("n_events"),
        sum(expr("cnt * cnt")).cast("bigint").as("s2"))
      .filter(col("n_days") >= 2 && col("n_events") > 0)
      .select(col("event_type"), col("n_days"), col("n_events"),
        expr("(1000000 * (n_days * s2 - n_events * n_events)) div " +
          "((n_days - 1) * n_events)").cast("bigint").as("fano_e6"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q287

  /** q287 — DYADIC EWMA trend + spike flag over the daily event stream:
    * the exponentially-weighted control chart next to q148's z-score
    * detector, built so the smoother itself is EXACT. With α = 1/2 the
    * 20-term truncated EWMA numerator is a pure integer —
    * prior(t) = Σ_{k=1..20} cnt(t−k)·2^{20−k} — because every weight
    * is a power of two; the one readout division (milli-units, /2^20)
    * and the 2× spike test (cnt·2^20 > 2·prior) stay on the BIGINT
    * lattice. The forecast deliberately EXCLUDES the current day
    * (an EWMA that includes today can never be exceeded 2×), and the
    * spike flag arms only after a full 20-day warmup so cold-start
    * days never alert.
    *
    * Scale shape: one scan into the (event_type, day) count —
    * map-side combinable, bounded by types × days — then everything
    * (densify spine, the ×20 dyadic fanout, the rollup) runs on that
    * bounded summary frame; the 1-row-per-type bounds frame
    * broadcasts. Truncation at 20 terms is exact relative to the
    * infinite EWMA to 1 part in 2^20 — below the milli readout. */
  def q287EwmaTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
    val bounds = daily.groupBy("event_type")
      .agg(min("d").as("d0"), max("d").as("d1"))
    val spine = bounds.select(col("event_type"),
      explode(expr("sequence(d0, d1, interval 1 day)")).as("d"),
      lit(0L).as("cnt"))
    val dense = daily.union(spine).groupBy("event_type", "d")
      .agg(max("cnt").as("cnt"))
    val prior = dense
      .select(col("event_type"), col("d"), col("cnt"),
        explode(expr("sequence(1, 20)")).as("k"))
      .select(col("event_type"), expr("date_add(d, k)").as("d"),
        expr("cnt * shiftleft(1L, 20 - k)").as("term"))
      .groupBy("event_type", "d")
      .agg(sum("term").cast("bigint").as("prior"))
    dense.join(prior, Seq("event_type", "d"), "left")
      .join(broadcast(bounds.select("event_type", "d0")), Seq("event_type"))
      .withColumn("prior", coalesce(col("prior"), lit(0L)))
      .select(col("event_type"), col("d"), col("cnt"),
        expr("(1000 * prior) div 1048576").cast("bigint").as("ewma_milli"),
        expr("cast(case when datediff(d, d0) >= 20 " +
          "and cnt * 1048576 > 2 * prior then 1 else 0 end as int)")
          .as("spike"))
      .orderBy("event_type", "d")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q287_ewma_trend" -> (q287EwmaTrend _),
    "q264_burstiness" -> (q264Burstiness _),
    "q224_cumulative_distinct" -> (q224CumulativeDistinct _),
    "q143_max_concurrency" -> (q143MaxConcurrency _),
    "q145_event_paths" -> (q145EventPaths _),
    "q146_time_weighted_avg" -> (q146TimeWeightedAvg _),
    "q148_day_anomaly" -> (q148DayAnomaly _),
    "q149_densify_ffill" -> (q149DensifyFfill _),
    "q159_seasonality_index" -> (q159SeasonalityIndex _),
    "q164_session_window" -> (q164SessionWindow _),
    "q165_behavior_clones" -> (q165BehaviorClones _),
    "q173_capped_balance" -> (q173CappedBalance _),
    "q175_decay_score" -> (q175DecayScore _),
    "q179_daily_drift" -> (q179DailyDrift _),
    "q189_transition_matrix" -> (q189TransitionMatrix _),
    "q196_session_entry_exit" -> (q196SessionEntryExit _),
    "q197_theil_sen" -> (q197TheilSen _),
    "q198_acf_panel" -> (q198AcfPanel _),
    "q180_funnel_latency" -> (q180FunnelLatency _),
    "q181_autocorrelation" -> (q181Autocorrelation _),
    "q208_interval_overlap" -> (q208IntervalOverlap _),
    "q216_sliding_distinct" -> (q216SlidingDistinct _),
    "q231_sliding_median" -> (q231SlidingMedian _),
    "q237_rolling_correlation" -> (q237RollingCorrelation _),
    "q239_linear_attribution" -> (q239LinearAttribution _),
  )

  val oracles: Map[String, String] = Map(
    // q287: the same densified daily frame, the identical dyadic
    // contribution fanout, and the same warmup-gated integer spike test
    "q287_ewma_trend" ->
      """WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, MIN(d) AS d0, MAX(d) AS d1
        |  FROM dc GROUP BY 1),
        |sp AS (SELECT event_type,
        |    CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
        |      AS d
        |  FROM b),
        |dense AS (SELECT sp.event_type, sp.d, COALESCE(dc.cnt, 0) AS cnt
        |  FROM sp LEFT JOIN dc USING (event_type, d)),
        |ct AS (SELECT event_type, CAST(d + CAST(k AS INT) AS DATE) AS d,
        |    cnt * (CAST(1 AS BIGINT) << (20 - k)) AS term
        |  FROM dense, (SELECT UNNEST(generate_series(1, 20)) AS k) ks),
        |pr2 AS (SELECT event_type, d, CAST(SUM(term) AS BIGINT) AS prior
        |  FROM ct GROUP BY 1, 2)
        |SELECT dense.event_type, dense.d, dense.cnt,
        |  CAST((1000 * COALESCE(prior, 0)) // 1048576 AS BIGINT)
        |    AS ewma_milli,
        |  CAST(CASE WHEN dense.d >= b.d0 + 20
        |    AND dense.cnt * 1048576 > 2 * COALESCE(prior, 0)
        |    THEN 1 ELSE 0 END AS INT) AS spike
        |FROM dense LEFT JOIN pr2 USING (event_type, d)
        |  JOIN b USING (event_type)
        |ORDER BY event_type, d""".stripMargin,
    "q264_burstiness" ->
      """WITH c AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |spans AS (SELECT event_type, MIN(d) AS d0, MAX(d) AS d1
        |  FROM c GROUP BY event_type),
        |spine AS (SELECT event_type,
        |    CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d,
        |    CAST(0 AS BIGINT) AS cnt
        |  FROM spans),
        |dense AS (SELECT event_type, d, MAX(cnt) AS cnt FROM (
        |    SELECT * FROM c UNION ALL SELECT * FROM spine)
        |  GROUP BY event_type, d),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(cnt) AS BIGINT) AS n_events,
        |    CAST(SUM(cnt * cnt) AS BIGINT) AS s2
        |  FROM dense GROUP BY event_type)
        |SELECT event_type, n_days, n_events,
        |  CAST((1000000 * (n_days * s2 - n_events * n_events))
        |    // ((n_days - 1) * n_events) AS BIGINT) AS fano_e6
        |FROM g WHERE n_days >= 2 AND n_events > 0
        |ORDER BY event_type""".stripMargin,
    "q239_linear_attribution" ->
      """WITH p AS (SELECT user_id, event_id AS pid, ts AS pts,
        |    CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS cid, ts AS cts
        |  FROM events WHERE event_type = 'click'),
        |t AS (SELECT p.user_id, p.pid, p.vc, c.cid, c.cts
        |  FROM p JOIN c ON c.user_id = p.user_id
        |  WHERE c.cts <= p.pts AND c.cts >= p.pts - INTERVAL 7 DAY),
        |r AS (SELECT user_id, pid, vc,
        |    CAST(COUNT(*) OVER (PARTITION BY pid) AS BIGINT) AS k,
        |    CAST(row_number() OVER (PARTITION BY pid ORDER BY cts, cid)
        |      AS BIGINT) AS rnk
        |  FROM t)
        |SELECT user_id,
        |  CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_purchases,
        |  CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(SUM(vc // k + CASE WHEN rnk <= vc % k THEN 1 ELSE 0 END)
        |    AS BIGINT) AS attributed_cents
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q237_rolling_correlation" ->
      """WITH ev AS (SELECT event_type AS t, CAST(ts AS DATE) AS d FROM events),
        |days AS (SELECT DISTINCT d FROM ev),
        |types AS (SELECT DISTINCT t FROM ev),
        |cnt AS (SELECT t, d, CAST(COUNT(*) AS BIGINT) AS c FROM ev GROUP BY t, d),
        |grid AS (SELECT ty.t, dy.d,
        |    datediff('day', DATE '1970-01-01', dy.d) AS di,
        |    COALESCE(c.c, 0) AS c
        |  FROM types ty CROSS JOIN days dy
        |  LEFT JOIN cnt c ON c.t = ty.t AND c.d = dy.d),
        |p AS (SELECT a.t AS ta, b.t AS tb, a.d, a.di, a.c AS ca, b.c AS cb
        |  FROM grid a JOIN grid b ON a.di = b.di AND a.t < b.t),
        |m AS (SELECT ta, tb, d,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS n,
        |    CAST(SUM(ca) OVER w AS BIGINT) AS sa,
        |    CAST(SUM(cb) OVER w AS BIGINT) AS sb,
        |    CAST(SUM(ca * ca) OVER w AS BIGINT) AS saa,
        |    CAST(SUM(cb * cb) OVER w AS BIGINT) AS sbb,
        |    CAST(SUM(ca * cb) OVER w AS BIGINT) AS sab
        |  FROM p
        |  WINDOW w AS (PARTITION BY ta, tb ORDER BY di
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT ta, tb, d, n AS n_days,
        |  CASE WHEN n*saa - sa*sa > 0 AND n*sbb - sb*sb > 0 THEN
        |    CAST(FLOOR(CAST(n*sab - sa*sb AS DOUBLE)
        |      / (sqrt(CAST(n*saa - sa*sa AS DOUBLE))
        |      * sqrt(CAST(n*sbb - sb*sb AS DOUBLE))) * 1e6) AS BIGINT)
        |  END AS corr7_e6
        |FROM m ORDER BY ta, tb, d""".stripMargin,
    // the independent prefix formulation: correlated COUNT(DISTINCT)
    // per (type, day) — what proves the first-occurrence decomposition
    "q224_cumulative_distinct" ->
      """WITH ed AS (SELECT DISTINCT event_type, user_id, CAST(ts AS DATE) AS d
        |    FROM events),
        |days AS (SELECT DISTINCT event_type, d FROM ed),
        |firsts AS (SELECT event_type, user_id, MIN(d) AS fd
        |  FROM ed GROUP BY event_type, user_id)
        |SELECT days.event_type, days.d,
        |  CAST((SELECT COUNT(*) FROM firsts f
        |     WHERE f.event_type = days.event_type AND f.fd = days.d) AS BIGINT)
        |    AS n_new,
        |  CAST((SELECT COUNT(DISTINCT e.user_id) FROM ed e
        |     WHERE e.event_type = days.event_type AND e.d <= days.d) AS BIGINT)
        |    AS lifetime_users
        |FROM days ORDER BY days.event_type, days.d""".stripMargin,
    // the bounded-fanout decomposition's oracle is the direct range
    // join + COUNT DISTINCT — fine at oracle scale, unbounded at ours
    // the independent range-join formulation — correct at oracle scale,
    // a per-day re-join at ours; what the hash check proves is that the
    // bounded-fanout decomposition computes the same windows
    "q231_sliding_median" ->
      """WITH e AS (SELECT event_type, value, CAST(ts AS DATE) AS d FROM events),
        |days AS (SELECT DISTINCT event_type, d FROM e)
        |SELECT days.event_type, days.d,
        |  CAST(COUNT(*) AS BIGINT) AS n_7d,
        |  quantile_cont(e.value, 0.5) AS median_7d
        |FROM days JOIN e ON e.event_type = days.event_type
        |  AND e.d BETWEEN days.d - 6 AND days.d
        |GROUP BY days.event_type, days.d
        |ORDER BY days.event_type, days.d""".stripMargin,
    "q216_sliding_distinct" ->
      """WITH ed AS (SELECT DISTINCT event_type, user_id, CAST(ts AS DATE) AS d
        |    FROM events),
        |days AS (SELECT DISTINCT event_type, d FROM ed)
        |SELECT days.event_type, days.d,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users_7d
        |FROM days JOIN ed e ON e.event_type = days.event_type
        |  AND e.d BETWEEN days.d - 6 AND days.d
        |GROUP BY days.event_type, days.d
        |ORDER BY days.event_type, days.d""".stripMargin,
    // sweep line: boundary deltas -> per-date nets -> running sum
    "q143_max_concurrency" ->
      """WITH li AS (SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS d0,
        |    CAST(l_shipdate AS DATE) + CAST(l_quantity AS INT) AS d1 FROM lineitem),
        |deltas AS (SELECT flag, d, SUM(delta) AS net FROM (
        |    SELECT flag, d0 AS d, 1 AS delta FROM li
        |    UNION ALL SELECT flag, d1, -1 FROM li)
        |  GROUP BY flag, d),
        |conc AS (SELECT flag, d,
        |    SUM(net) OVER (PARTITION BY flag ORDER BY d) AS c FROM deltas),
        |pk AS (SELECT flag, MAX(c) AS peak FROM conc GROUP BY flag)
        |SELECT conc.flag AS l_returnflag,
        |  CAST(pk.peak AS BIGINT) AS peak_concurrency,
        |  MIN(conc.d) AS peak_date
        |FROM conc JOIN pk ON pk.flag = conc.flag AND conc.c = pk.peak
        |GROUP BY conc.flag, pk.peak ORDER BY l_returnflag""".stripMargin,
    // ORDER BY inside the aggregate pins the assembled string
    "q145_event_paths" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  STRING_AGG(event_type, ',' ORDER BY ts, event_id) AS path
        |FROM events WHERE user_id < 40
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // identical BIGINT interval arithmetic; identical 3-op double chain
    "q146_time_weighted_avg" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS t_us,
        |    CAST(round(value * 100) AS BIGINT) AS v_q
        |  FROM events WHERE user_id < 40),
        |seg AS (SELECT user_id, v_q,
        |    LEAD(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
        |      - t_us AS dt
        |  FROM ev)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
        |  CAST(SUM(dt) AS BIGINT) AS total_us,
        |  CAST(SUM(v_q * dt) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE) / 100.0 AS twa
        |FROM seg WHERE dt IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // same exact-moment arithmetic, same op order, same terminal floor
    "q148_day_anomaly" ->
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
         |    COUNT(*) AS cnt FROM events GROUP BY event_type, d),
         |${dayAnomalySql("daily")}
         |SELECT event_type, d, CAST(cnt AS BIGINT) AS cnt,
         |  CAST(FLOOR(z * 1000000.0) AS BIGINT) AS z_e6
         |FROM z ORDER BY event_type, d""".stripMargin,
    // day-close by ROW_NUMBER over the same (ts, event_id) total order;
    // LAST_VALUE IGNORE NULLS = last(ignoreNulls) under the default frame
    "q149_densify_ffill" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d, ts, event_id, value
        |  FROM events WHERE user_id < 30),
        |daily AS (SELECT user_id, d, value AS day_close FROM (
        |    SELECT user_id, d, value, ROW_NUMBER() OVER (
        |      PARTITION BY user_id, d ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM ev) x WHERE rn = 1),
        |spans AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1
        |  FROM ev GROUP BY user_id),
        |spine AS (SELECT user_id,
        |    CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM spans),
        |j AS (SELECT s.user_id, s.d, daily.day_close
        |  FROM spine s LEFT JOIN daily
        |    ON daily.user_id = s.user_id AND daily.d = s.d)
        |SELECT user_id, d, day_close IS NOT NULL AS observed,
        |  CAST(round(LAST_VALUE(day_close IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY d) * 100) AS BIGINT) AS filled_e2
        |FROM j ORDER BY user_id, d""".stripMargin,
    // DuckDB dayofweek is Sunday=0 — +1 aligns to Spark (q142 rule);
    // the index never leaves the integer lattice (cross-multiplied
    // floor division of positive BIGINTs)
    "q159_seasonality_index" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    COUNT(*) AS cnt FROM events GROUP BY event_type, d),
        |dd AS (SELECT event_type, CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
        |    cnt FROM daily),
        |bydow AS (SELECT event_type, dow, SUM(cnt) AS cnt_dow,
        |    COUNT(*) AS days_dow FROM dd GROUP BY event_type, dow),
        |tot AS (SELECT event_type, SUM(cnt) AS cnt_tot,
        |    COUNT(*) AS days_tot FROM dd GROUP BY event_type)
        |SELECT b.event_type, b.dow, CAST(b.cnt_dow AS BIGINT) AS cnt_dow,
        |  CAST(b.days_dow AS BIGINT) AS days_dow,
        |  CAST((1000000 * b.cnt_dow * t.days_tot)
        |    // (b.days_dow * t.cnt_tot) AS BIGINT) AS idx_e6
        |FROM bydow b JOIN tot t ON t.event_type = b.event_type
        |ORDER BY b.event_type, b.dow""".stripMargin,
    // independent gaps-and-islands construction: lag-gap flag (>= 30 min
    // opens a new session — end-exclusive windows), running session id,
    // per-session bounds; end = last event + gap
    "q164_session_window" ->
      """WITH x AS (SELECT user_id, ts, event_id,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |         OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM x),
        |s AS (SELECT user_id, sid, MIN(ts) AS st, MAX(ts) AS en,
        |    COUNT(*) AS n FROM g GROUP BY user_id, sid)
        |SELECT user_id, strftime(st, '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(en + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
        |  CAST(n AS BIGINT) AS n_events
        |FROM s ORDER BY user_id, session_start""".stripMargin,
    // same ordered-assembly (q122/q145 rule); the Spark side's
    // deletion-neighborhood blocking is COMPLETE at radius 1, so the
    // oracle is plain brute force over the radius (|Δlen| <= 1 is a
    // necessary condition, a prefilter only) — the engines agree
    // exactly because the filter is lossless, not because the oracle
    // mirrors the blocking arithmetic
    "q165_behavior_clones" ->
      """WITH p AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS d,
        |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
        |      AS path
        |  FROM events GROUP BY user_id, CAST(date_trunc('week', ts) AS DATE))
        |SELECT a.user_id AS user_a, a.d AS day_a,
        |  b.user_id AS user_b, b.d AS day_b,
        |  CAST(length(a.path) AS INTEGER) AS len_a,
        |  CAST(levenshtein(a.path, b.path) AS INTEGER) AS dist
        |FROM p a JOIN p b
        |  ON a.user_id < b.user_id
        |  AND abs(length(a.path) - length(b.path)) <= 1
        |WHERE levenshtein(a.path, b.path) <= 1
        |ORDER BY dist, user_a, day_a, user_b, day_b
        |LIMIT 20""".stripMargin,
    // identical integer clamp recurrence; list_reduce seeds from the
    // first element, so 0 is prepended as the initial state
    "q173_capped_balance" ->
      """WITH d AS (SELECT user_id, ts, event_id,
        |    CASE WHEN event_type IN ('purchase', 'error')
        |      THEN -CAST(round(value * 100) AS BIGINT)
        |      ELSE CAST(round(value * 100) AS BIGINT) END AS delta
        |  FROM events WHERE user_id < 60),
        |g AS (SELECT user_id, COUNT(*) AS n_events, SUM(delta) AS net_sum,
        |    list(delta ORDER BY ts, event_id) AS deltas
        |  FROM d GROUP BY user_id)
        |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(net_sum AS BIGINT) AS net_sum,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), deltas),
        |    (acc, x) -> greatest(CAST(0 AS BIGINT), acc + x)) AS BIGINT)
        |    AS final_balance
        |FROM g ORDER BY user_id""".stripMargin,
    // identical dyadic weights (1e6 >> min(age_weeks, 20)); all-integer
    "q175_decay_score" ->
      """WITH mx AS (SELECT MAX(epoch_us(ts)) AS a FROM events),
        |e AS (SELECT user_id,
        |    LEAST(((SELECT a FROM mx) - epoch_us(ts)) // 604800000000, 20) AS k,
        |    CAST(round(value * 100) AS BIGINT) AS v_q
        |  FROM events WHERE user_id < 60)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(v_q * (1000000 >> k)) AS BIGINT) AS score_e8
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,
    // dense generated bucket grid aligns the two CDFs; sup over exact
    // cross-multiplied BIGINTs; one division per day
    // q164's independent gaps-and-islands session identity (already
    // parity-proven against session_window), entry/exit via ranked
    // rows, identical mirrored bounce-share division
    "q196_session_entry_exit" ->
      """WITH x AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |         OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT user_id, ts, event_id, event_type,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM x),
        |e AS (SELECT user_id, sid, event_type,
        |    row_number() OVER (PARTITION BY user_id, sid
        |      ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY user_id, sid
        |      ORDER BY ts DESC, event_id DESC) AS rn_d,
        |    COUNT(*) OVER (PARTITION BY user_id, sid) AS n
        |  FROM g),
        |s AS (SELECT user_id, sid,
        |    MIN(CASE WHEN rn_a = 1 THEN event_type END) AS entry_type,
        |    MIN(CASE WHEN rn_d = 1 THEN event_type END) AS exit_type,
        |    MIN(n) AS n
        |  FROM e GROUP BY user_id, sid)
        |SELECT entry_type, exit_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bounces,
        |  CAST(FLOOR(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS BIGINT)
        |    AS bounce_share_e6
        |FROM s GROUP BY entry_type, exit_type
        |ORDER BY entry_type, exit_type""".stripMargin,
    // identical offset-then-quantize slope keys (positive numerator,
    // so // == div); median values read at the two middle ranks
    "q197_theil_sen" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    COUNT(*) AS c FROM events GROUP BY event_type, d),
        |x AS (SELECT event_type, c,
        |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
        |  FROM daily),
        |p AS (SELECT a.event_type,
        |    ((b.c - a.c + 1000000 * (b.i - a.i)) * 1000000000)
        |      // (b.i - a.i) AS k
        |  FROM x a JOIN x b ON b.event_type = a.event_type AND b.i > a.i),
        |r AS (SELECT event_type, k,
        |    row_number() OVER (PARTITION BY event_type ORDER BY k) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM p)
        |SELECT event_type, CAST(MIN(n) AS BIGINT) AS n_pairs,
        |  CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN k END)
        |    - 1000000000000000 AS BIGINT) AS slope_lo_e9,
        |  CAST(MIN(CASE WHEN rn = n // 2 + 1 THEN k END)
        |    - 1000000000000000 AS BIGINT) AS slope_hi_e9,
        |  (CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN k END)
        |      - 1000000000000000 AS DOUBLE)
        |   + CAST(MIN(CASE WHEN rn = n // 2 + 1 THEN k END)
        |      - 1000000000000000 AS DOUBLE)) / 2.0 AS slope_e9
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    // identical calendar lag pairing over day summaries; the identical
    // q181 moment chain per (type, lag)
    "q198_acf_panel" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    COUNT(*) AS c FROM events GROUP BY event_type, d),
        |pairs AS (SELECT a.event_type, g.k AS lag, a.c AS x, b.c AS y
        |  FROM daily a
        |  CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS k) g
        |  JOIN daily b ON b.event_type = a.event_type
        |    AND a.d = b.d + CAST(g.k AS INTEGER)),
        |m AS (SELECT event_type, lag, COUNT(*) AS n, SUM(x) AS sx,
        |    SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx,
        |    SUM(y * y) AS syy
        |  FROM pairs GROUP BY event_type, lag)
        |SELECT event_type, CAST(lag AS INTEGER) AS lag,
        |  CAST(n AS BIGINT) AS n_pairs,
        |  CAST(FLOOR(
        |    CAST(n * sxy - sx * sy AS DOUBLE) /
        |    SQRT(CAST(n * sxx - sx * sx AS DOUBLE) *
        |         CAST(n * syy - sy * sy AS DOUBLE)) * 1000000.0)
        |    AS BIGINT) AS r_e6
        |FROM m ORDER BY event_type, lag""".stripMargin,
    // identical (ts, event_id) lag pairing; the per-row share is one
    // mirrored division over the bounded matrix
    "q189_transition_matrix" ->
      """WITH p AS (SELECT user_id, event_type AS to_type,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS from_type
        |  FROM events),
        |m AS (SELECT from_type, to_type, COUNT(*) AS n FROM p
        |  WHERE from_type IS NOT NULL GROUP BY from_type, to_type)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        |  CAST(FLOOR(CAST(n AS DOUBLE) /
        |    CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE)
        |    * 1000000.0) AS BIGINT) AS p_e6
        |FROM m ORDER BY from_type, to_type""".stripMargin,
    "q179_daily_drift" ->
      """WITH counts AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(floor(value) AS BIGINT) AS vb, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |days AS (SELECT DISTINCT d FROM counts),
        |grid AS (SELECT d, i AS vb
        |  FROM days, unnest(generate_series(0, 500)) AS g(i)),
        |cdf AS (SELECT g.d, g.vb,
        |    SUM(COALESCE(c.c, 0)) OVER (PARTITION BY g.d ORDER BY g.vb
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(COALESCE(c.c, 0)) OVER (PARTITION BY g.d) AS n
        |  FROM grid g LEFT JOIN counts c ON c.d = g.d AND c.vb = g.vb),
        |j AS (SELECT a.d, a.cum, a.n, b.cum AS cum_p, b.n AS n_p
        |  FROM cdf a JOIN cdf b ON b.d = a.d - 1 AND b.vb = a.vb)
        |SELECT d, CAST(MIN(n) AS BIGINT) AS n_day,
        |  CAST(MIN(n_p) AS BIGINT) AS n_prev,
        |  CAST(MAX(ABS(cum * n_p - cum_p * n)) AS BIGINT) AS d_num,
        |  CAST(MAX(ABS(cum * n_p - cum_p * n)) AS DOUBLE)
        |    / CAST(MIN(n) * MIN(n_p) AS DOUBLE) AS ks
        |FROM j GROUP BY d ORDER BY d""".stripMargin,
    // strictly-after first-view purchases; median by the same rank
    // arithmetic; every division mirrored
    "q180_funnel_latency" ->
      """WITH fv AS (SELECT user_id, MIN(epoch_us(ts)) AS tv FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |lat AS (SELECT e.user_id, MIN(epoch_us(e.ts)) - MIN(fv.tv) AS v
        |  FROM events e JOIN fv ON fv.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > fv.tv
        |  GROUP BY e.user_id),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM lat),
        |agg AS (SELECT COUNT(*) AS n, SUM(v) AS s FROM lat),
        |med AS (SELECT CAST(
        |    MIN(CASE WHEN rn = (agg.n + 1) // 2 THEN v END) +
        |    MIN(CASE WHEN rn = agg.n // 2 + 1 THEN v END) AS DOUBLE) / 2.0 AS m
        |  FROM r, agg GROUP BY agg.n)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fv) AS n_viewers,
        |  CAST(agg.n AS BIGINT) AS n_converted,
        |  CAST(agg.s AS DOUBLE) / CAST(agg.n AS DOUBLE) AS mean_latency_us,
        |  med.m AS median_latency_us
        |FROM agg, med""".stripMargin,
    // the q110 exact-moment discipline over day summaries
    "q181_autocorrelation" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    COUNT(*) AS cnt FROM events GROUP BY event_type, d),
        |p AS (SELECT a.event_type, a.cnt AS x, b.cnt AS y
        |  FROM daily a JOIN daily b
        |    ON b.event_type = a.event_type AND b.d = a.d - 1),
        |m AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM p GROUP BY event_type)
        |SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
        |  CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |           * CAST(n * syy - sy * sy AS DOUBLE))
        |    * 1000000.0) AS BIGINT) AS r_e6
        |FROM m ORDER BY event_type""".stripMargin,
    // bucket-and-verify == direct range join (the buckets are exactly the
    // hours each span touches); identical closed-interval µs arithmetic
    "q208_interval_overlap" ->
      """WITH spans AS (SELECT user_id, CAST(ts AS DATE) AS d,
        |    MIN(ts) AS a0, MAX(ts) AS a1 FROM events GROUP BY user_id, d),
        |hourly AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS cnt
        |  FROM events GROUP BY h),
        |tot AS (SELECT SUM(cnt) AS t, COUNT(*) AS nh FROM hourly),
        |inc AS (SELECT h FROM hourly, tot WHERE cnt * nh * 2 >= t * 3),
        |ex AS (SELECT user_id, d, a0, a1,
        |    UNNEST(generate_series(date_trunc('hour', a0),
        |      date_trunc('hour', a1), INTERVAL 1 HOUR)) AS h
        |  FROM spans),
        |j AS (SELECT user_id, d,
        |    LEAST(epoch_us(a1), epoch_us(h) + 3600000000)
        |      - GREATEST(epoch_us(a0), epoch_us(h)) AS ov
        |  FROM ex JOIN inc USING (h)
        |  WHERE a0 < h + INTERVAL 1 HOUR AND h <= a1)
        |SELECT CAST(user_id AS BIGINT) AS user_id, d,
        |  CAST(COUNT(*) AS BIGINT) AS n_inc_hours,
        |  CAST(SUM(ov) AS BIGINT) AS overlap_us
        |FROM j GROUP BY user_id, d ORDER BY user_id, d""".stripMargin,
  )
}
