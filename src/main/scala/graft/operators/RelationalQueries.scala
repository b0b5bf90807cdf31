package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational operator suite (SURVEY.md §2.3–§2.9, §2.11).
  *
  * Each query mirrors an operator family from the reference
  * (`/root/reference/spark/transform_load.py`, `/root/reference/sql/`)
  * re-expressed on the driver's TPC-H-ish fixture tables. Every query has a
  * DuckDB oracle twin in [[oracles]]; both sides follow the same determinism
  * contract:
  *
  *   - SUM over floating columns goes through an exact DECIMAL cast, then the
  *     final value is cast to DOUBLE (order-independent, bit-identical in
  *     both engines — a raw double sum depends on partial-aggregation order).
  *   - Averages are expressed as CAST(sum_decimal AS DOUBLE) / CAST(count AS
  *     DOUBLE): two identical operands, one IEEE division → identical bits.
  *   - Every computed numeric is cast to an explicit type (INT/BIGINT/DOUBLE)
  *     in BOTH engines so parquet/duckdb dtypes line up.
  *   - Nullable numeric outputs are COALESCEd (pandas turns nullable int64
  *     into float64+NaN, which never hash-compares equal).
  *   - Every query ends in a total ORDER BY on non-null keys.
  *
  * Scale notes (100 TB mindset) are on each query: which side broadcasts,
  * where the shuffles are, and why the plan survives a 1000-executor run.
  */
object RelationalQueries {

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")
  private def dec6(c: Column): Column = c.cast("decimal(18,6)")

  /** TPC-H Q1 shape — scan-heavy groupBy with map-side partial aggregation
    * (ref: aggregations.sql:2-5 count-group, transform_load.py casts).
    * Scales: one shuffle on a 6-value grouping key; partial aggs collapse
    * the 100 TB scan to KBs before the exchange. Filter pushes to parquet. */
  def q01Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base"),
        sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).cast("bigint").as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Top-k after dim join (ref: aggregations.sql:8-14 top destinations).
    * No broadcast hint: `part` scales with sf (tens of GB at 100 TB), so the
    * join strategy is left to AQE, which has runtime size stats and
    * broadcasts only when the built side actually fits. Catalyst plans
    * TakeOrderedAndProject so only 10 rows cross the final exchange. */
  def q02TopkJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    li.join(p, li("l_partkey") === p("p_partkey"), "left")
      .groupBy(coalesce(col("p_brand"), lit("?")).as("brand"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
      .orderBy(desc("cnt"), asc("brand"))
      .limit(10)
  }

  /** Date-range filter + dim join + agg (ref: aggregations.sql:18-26).
    * Predicate pushes to the orders scan (PushedFilters on o_orderdate);
    * customer is NOT hinted — it scales with sf, so the join strategy is
    * AQE's call from runtime sizes (it broadcasts at fixture scale and
    * must not be forced to at 100 TB). */
  def q03DateFilterJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.filter(col("o_orderdate").between(
        lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
      .join(c, o("o_custkey") === c("c_custkey"), "inner")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).cast("bigint").as("n_orders"),
           sum(dec2(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy("c_mktsegment")
  }

  private def perTypeDaily(s: SparkSession, dir: String, typ: String,
                           cntName: String, sumName: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === typ)
      .groupBy(col("user_id"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).cast("bigint").as(cntName),
           sum(dec6(col("value"))).cast("double").as(sumName))

  /** Two-key multi-way LEFT join (ref J1: rainfall⟕tasmin⟕tasmax on
    * (location_id, time), transform_load.py:266-273). Three branches of one
    * source, joined on (user_id, day). All three shuffles share the same
    * key → Catalyst reuses the exchange partitioning; no re-shuffle. */
  def q04MultikeyLeft(s: SparkSession, dir: String): DataFrame = {
    val clicks = perTypeDaily(s, dir, "click", "click_n", "click_sum")
    val views = perTypeDaily(s, dir, "view", "view_n", "view_sum")
    val purchases = perTypeDaily(s, dir, "purchase", "purch_n", "purch_sum")
    clicks
      .join(views, Seq("user_id", "d"), "left")
      .join(purchases, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"), col("click_n"), col("click_sum"),
        coalesce(col("view_n"), lit(0L)).as("view_n"),
        coalesce(col("view_sum"), lit(0.0)).as("view_sum"),
        coalesce(col("purch_n"), lit(0L)).as("purch_n"),
        coalesce(col("purch_sum"), lit(0.0)).as("purch_sum"))
      .orderBy("user_id", "d")
  }

  /** Self-join re-merge on the fact key (ref J5: start/end annotated fact
    * ⟕ on rental_id, transform_load.py:393-398). Aliased copies avoid
    * duplicate-column ambiguity; join key is the table's own key so the
    * left-join preserves cardinality. */
  def q05SelfJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val l1 = li.filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("l_quantity").as("qty1"),
              col("l_extendedprice").as("price1"))
    val l2 = li.filter(col("l_linenumber") === 2)
      .select(col("l_orderkey"), col("l_quantity").as("qty2"))
    l1.join(l2, Seq("l_orderkey"), "left")
      .select(col("l_orderkey"), col("qty1"), col("price1"),
              coalesce(col("qty2"), lit(-1.0)).as("qty2"))
      .orderBy("l_orderkey", "qty1", "price1", "qty2")
  }

  /** Role-playing dimension joined twice (ref J9 / make_view.sql:22-30:
    * locations as start_loc and end_loc). nation plays customer-nation and
    * supplier-nation via two aliased broadcast copies. */
  def q06RolePlaying(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val su = Tables.supplier(s, dir)
    val n1 = Tables.nation(s, dir).select(
      col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val n2 = Tables.nation(s, dir).select(
      col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    // only the 25-row nation roles are hinted; customer/supplier scale
    // with sf, so AQE picks their strategy from runtime sizes
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(su, li("l_suppkey") === su("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("cn_key"))
      .join(broadcast(n2), col("s_nationkey") === col("sn_key"))
      .groupBy("cust_nation", "supp_nation")
      .agg(count(lit(1)).cast("bigint").as("n_items"),
           sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
             .cast("double").as("revenue"))
      .orderBy("cust_nation", "supp_nation")
  }

  /** Four-key equi-join on derived calendar columns (ref J4: fact joined to
    * daily weather on (year, month, dayofmonth, station), transform_load
    * .py:365-373) — the minute-granularity ↔ day-granularity bridge.
    * The daily aggregate grows linearly with users×days, so it is NOT
    * broadcast-hinted: both sides shuffle on the same 4-part key and AQE
    * downgrades to broadcast at runtime only if the built side fits. */
  def q07FourKeyCalendar(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val fact = ev.select(col("event_id"), col("user_id"), col("value"),
      year(col("ts")).cast("int").as("y"),
      month(col("ts")).cast("int").as("m"),
      dayofmonth(col("ts")).cast("int").as("dom"))
    val daily = ev.groupBy(
        year(col("ts")).cast("int").as("y"),
        month(col("ts")).cast("int").as("m"),
        dayofmonth(col("ts")).cast("int").as("dom"),
        col("user_id"))
      .agg((sum(dec6(col("value"))).cast("double") /
            count(lit(1)).cast("double")).as("daily_avg"))
    fact.join(daily, Seq("y", "m", "dom", "user_id"), "left")
      .select(col("event_id"), col("y"), col("m"), col("dom"), col("user_id"),
              col("value"), coalesce(col("daily_avg"), lit(0.0)).as("daily_avg"))
      .orderBy("event_id")
  }

  /** RANGE-frame 7-day moving average (ref W1: aggregations.sql:36-42,
    * AVG OVER ORDER BY UNIX_DATE RANGE 7 PRECEDING), generalized with
    * partitionBy like the survey suggests. Moving avg is written as
    * window-sum(decimal)/window-count so both engines produce identical
    * doubles. One shuffle on the partition key; frames evaluate locally. */
  def q08WindowMovavg(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("prio"),
               col("o_orderdate").cast("date").as("d"))
      .agg(sum(dec2(col("o_totalprice"))).as("rev_dec"))
      .withColumn("dayint", datediff(col("d"), lit("1970-01-01").cast("date")).cast("int"))
    val w = Window.partitionBy("prio").orderBy("dayint").rangeBetween(-7, 0)
    daily.select(col("prio"), col("d"),
        col("rev_dec").cast("double").as("day_rev"),
        (sum(col("rev_dec")).over(w).cast("double") /
         count(lit(1)).over(w).cast("double")).as("mov_avg"))
      .orderBy("prio", "d")
  }

  /** Ranking window / argmin pattern (ref S8's numpy nearest-grid argmin,
    * ingest_weather_data.py:159-163, expressed as row_number per survey
    * §2.7). Deterministic tie-break on event_id. */
  def q09ArgminWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("value"))
      .orderBy("user_id")
  }

  /** Two-way contingency counts over derived booleans (ref A3:
    * aggregations.sql:63-66 is_warm × is_raining). */
  def q10Contingency(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select((col("value") > 50).as("is_high"),
              (col("event_type") === "error").as("is_error"))
      .groupBy("is_high", "is_error")
      .agg(count(lit(1)).cast("bigint").as("cnt"))
      .orderBy("is_high", "is_error")

  /** Per-column null-count profile (ref A5: transform_load.py:52-55) —
    * one pass, one row out. The column list is pinned (not read from the
    * frame) so it drifts in lockstep with the hardcoded oracle: a fixture
    * schema change breaks both sides loudly instead of silently turning
    * the check into a column-set mismatch. The dynamic-column form lives
    * in graft.Diagnostics.schemaProfile. */
  private val ordersProfileCols = Seq("o_orderkey", "o_custkey",
    "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  def q11NullProfile(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(ordersProfileCols.toIndexedSeq.map(c =>
      count(when(col(c).isNull, lit(1))).cast("bigint").as(s"nulls_$c")): _*)

  /** Global MIN/MAX bounds (ref A4: transform_load.py:460-463, the manual
    * dynamic-filter prologue). */
  def q12MinMax(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).agg(
      min(col("o_orderdate")).cast("date").as("min_date"),
      max(col("o_orderdate")).cast("date").as("max_date"),
      min(col("o_totalprice")).as("min_price"),
      max(col("o_totalprice")).as("max_price"))

  /** Union-all of branch slices then re-aggregate (ref U1: pd.concat of
    * per-station frames, ingest_weather_data.py:179). unionByName keeps
    * it schema-safe under column reordering. */
  def q13Union(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val a = ev.filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), col("value"))
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("value"), col("event_type"))
    a.unionByName(b)
      .groupBy("event_type")
      .agg(count(lit(1)).cast("bigint").as("cnt"),
           sum(dec6(col("value"))).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  /** DISTINCT projection (dropDuplicates) — exact dedup primitive at the
    * relational level; at scale this is a hash-aggregate shuffle on the
    * distinct key set only (2 narrow columns). */
  def q14Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_mktsegment"), col("c_nationkey"))
      .dropDuplicates()
      .orderBy("c_mktsegment", "c_nationkey")

  /** Hour-of-day histogram (ref O2/A2: aggregations.sql:29-34 peak cycling
    * hour). */
  def q15HourHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(hour(col("ts")).cast("int").as("hr"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
      .orderBy("hr")

  /** Cast / composite-key / string-assembly projections (ref P6-P8:
    * decimal lat/long casts transform_load.py:148-154, concat_ws surrogate
    * key :283-285, CONCAT geo point make_view.sql:13). Pure narrow map —
    * no shuffle, whole-stage codegen end to end. */
  def q16CastsKeys(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        concat_ws("_", col("c_custkey").cast("string"),
                       col("c_nationkey").cast("string")).as("cust_nation_key"),
        col("c_acctbal").cast("decimal(12,2)").cast("double").as("bal_dec"),
        concat(col("c_acctbal").cast("decimal(12,2)").cast("string"),
               lit(","), col("c_mktsegment")).as("bal_seg"))
      .orderBy("c_custkey")

  /** Generated minute-grid timestamp dimension (ref S12/E1:
    * transform_load.py:104-120 — sequence + explode + unix key + calendar
    * projections). One month here; the reference's 6-year grid is the same
    * plan. Parallel generation: one `range` row per day, each exploding its
    * own 1440-minute sequence — the grid is produced across partitions
    * instead of in a single task (a 3.2M-row straggler at reference scale). */
  def minuteGrid(s: SparkSession, days: Int): DataFrame =
    s.range(days).select(explode(expr(
        "sequence(timestamp'2024-01-01 00:00:00' + make_dt_interval(cast(id as int)), " +
        "timestamp'2024-01-01 23:59:00' + make_dt_interval(cast(id as int)), interval 1 minute)"
      )).as("ts"))

  def q17TimestampDim(s: SparkSession, dir: String): DataFrame =
    minuteGrid(s, 31)
      .select(
        unix_timestamp(col("ts")).cast("int").as("id"),
        year(col("ts")).cast("int").as("year"),
        month(col("ts")).cast("int").as("month"),
        dayofmonth(col("ts")).cast("int").as("dayofmonth"),
        weekofyear(col("ts")).cast("int").as("weekofyear"),
        hour(col("ts")).cast("int").as("hour"),
        minute(col("ts")).cast("int").as("minute"))
      .orderBy("id")

  /** CASE WHEN categorical buckets + join back to the fact (ref F5/F6/J8:
    * aggregations.sql:45-60 — CTE of weather categories joined to fact).
    * The categorized daily dim is an unbounded aggregate (users×days), so
    * no broadcast hint — both sides shuffle on (user_id, d) and AQE picks
    * the physical join from runtime sizes. */
  def q18Categories(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val daily = ev.groupBy(col("user_id"), col("ts").cast("date").as("d"))
      .agg((sum(dec6(col("value"))).cast("double") /
            count(lit(1)).cast("double")).as("daily_avg"),
           count(lit(1)).cast("bigint").as("n"))
      .select(col("user_id"), col("d"),
        when(col("daily_avg") > 60, "high")
          .when(col("daily_avg") > 40, "mid")
          .otherwise("low").as("category"),
        (col("n") > 3).as("is_active"))
    ev.select(col("event_id"), col("user_id"), col("ts").cast("date").as("d"))
      .join(daily, Seq("user_id", "d"), "inner")
      .groupBy("category", "is_active")
      .agg(count(lit(1)).cast("bigint").as("cnt"))
      .orderBy("category", "is_active")
  }

  /** Manual dynamic min/max filter (ref E3 step 3: eager min/max action
    * bounds the dim re-scan, transform_load.py:460-483). The driver-side
    * action is tiny (2 values); the bounds become pushable literals —
    * the hand-rolled analog of dynamic partition pruning. */
  def q19DynamicMinMax(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val row = ev.agg(min(col("ts")).as("mn"), max(col("ts")).as("mx")).first()
    val (mn, mx) = (row.getTimestamp(0), row.getTimestamp(1))
    minuteGrid(s, 31)
      .filter(col("ts") >= lit(mn) && col("ts") <= lit(mx))
      .groupBy(col("ts").cast("date").as("d"))
      .agg(count(lit(1)).cast("bigint").as("minutes"))
      .orderBy("d")
  }

  /** Wide denormalized analytics view (ref K5/J9: make_view.sql:3-32 —
    * fact ⟕ role-playing dims, ordered projection). Dims broadcast; the
    * only big shuffle is the fact⨝orders join, which at scale co-partitions
    * on orderkey (both sides bucketed on the same key reuse partitioning). */
  def q20ViewStar(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val su = Tables.supplier(s, dir)
    val p = Tables.part(s, dir)
    val n1 = Tables.nation(s, dir).select(
      col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val n2 = Tables.nation(s, dir).select(
      col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    // nation roles are bounded (hinted); customer/supplier/part scale
    // with sf and are left to AQE's runtime-size decision
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(su, li("l_suppkey") === su("s_suppkey"))
      .join(p, li("l_partkey") === p("p_partkey"))
      .join(broadcast(n1), col("c_nationkey") === col("cn_key"))
      .join(broadcast(n2), col("s_nationkey") === col("sn_key"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("o_orderdate").cast("date").as("order_date"),
        col("c_name"), col("cust_nation"), col("supp_nation"),
        col("p_name"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Skew-safe two-phase distinct aggregation (beyond the reference's
    * surface — it has no distinct-aggs at all, SURVEY §2.6). A direct
    * `count(DISTINCT user_id)` with a hot grouping key concentrates every
    * distinct value of that key in one shuffle partition; the two-phase
    * form — pre-aggregate on (key, user), then count per key — spreads the
    * first (heavy) exchange over the full composite key space, the same
    * mechanics as salting a hot key. Phase 2's input is one row per
    * (key, user): bounded by true cardinality, not event volume. */
  def q38TwoPhaseDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      // a NULL user_id forms its own phase-1 group but must not count as a
      // distinct user (SQL COUNT(DISTINCT) skips NULLs); its rows still
      // count in n_events
      .agg(count(when(col("user_id").isNotNull, lit(1))).cast("bigint").as("n_users"),
           sum(col("n")).cast("bigint").as("n_events"))
      .orderBy("event_type")

  /** Sessionization via gaps-and-islands (beyond the reference's surface):
    * a new session starts after a >30-minute silence; session ids are a
    * running sum of session-start flags. Two windows and one aggregate, all
    * partitioned by user — one shuffle total, frames evaluate locally.
    * This is the batch twin of the stateful streaming sessionizer
    * (graft.streaming.Sessionize), which must produce identical sessions. */
  def q39Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          expr("unix_micros(ts) - unix_micros(prev_ts)") > 1800L * 1000000, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("is_new")).over(byUser).cast("int"))
      .groupBy("user_id", "session_idx")
      .agg(date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
           date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
           count(lit(1)).cast("bigint").as("n_events"))
      .orderBy("user_id", "session_idx")
  }

  /** RANGE join (interval containment) in the form that scales: intervals
    * are exploded into the hour buckets they span, events bucket to their
    * hour, and the join is an EQUI-join on (entity, hour) with the exact
    * `ts BETWEEN start AND end` containment as a post-filter — never the
    * raw theta-join, which Catalyst can only plan as a broadcast-nested-
    * loop over the fact table. Intervals here are q39's sessions truncated
    * to seconds (both engines truncate identically); the count per session
    * can exceed q39's n_events only at sub-second boundary edges, which
    * the truncation makes deterministic on both sides. Bucket fan-out is
    * bounded by interval span / bucket width — pick the bucket width at
    * the p99 interval span so the explode stays O(1) per interval. */
  def q57RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val sess = q39Sessionize(s, dir)
      .select(col("user_id"), col("session_idx"),
        to_timestamp(col("session_start")).as("st"),
        to_timestamp(col("session_end")).as("en"))
    val hours = sess.select(col("user_id"), col("session_idx"), col("st"), col("en"),
      explode(expr(
        "sequence(date_trunc('hour', st), date_trunc('hour', en), interval 1 hour)")).as("hr"))
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), expr("date_trunc('hour', ts)").as("hr"))
    hours.join(ev, Seq("user_id", "hr"))
      .filter(col("ts") >= col("st") && col("ts") <= col("en"))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).cast("bigint").as("n_in_range"))
      .select(col("user_id").cast("bigint").as("user_id"),
              col("session_idx").cast("int").as("session_idx"), col("n_in_range"))
      .orderBy("user_id", "session_idx")
  }

  /** ROLLUP hierarchy totals (extends SURVEY §2.6 — the reference has no
    * grouping sets; Catalyst plans them as a single Expand + aggregate, one
    * shuffle for every grouping level at once). The grouping level is made
    * explicit so subtotal rows (null keys) sort deterministically. */
  def q43Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .rollup(col("event_type"), hour(col("ts")).cast("int").as("hr"))
      .agg(count(lit(1)).cast("bigint").as("cnt"),
           sum(dec6(col("value"))).cast("double").as("sum_value"))
      .select(
        coalesce(col("event_type"), lit("<all>")).as("event_type"),
        coalesce(col("hr"), lit(-1)).as("hr"),
        col("cnt"), col("sum_value"))
      .orderBy("event_type", "hr")

  /** GROUPING SETS revenue summary — the general form completing the
    * q43 ROLLUP / q44 PIVOT grouping family: revenue and order counts
    * at every combination of the (region, segment) hierarchy that a
    * dashboard actually reads — both, each alone, and the grand total —
    * in ONE pass (Catalyst expands the sets into a single Expand +
    * aggregate, not four scans). The grouping id is assembled
    * explicitly as 2·grouping(region) + grouping(segment) because both
    * engines ship `grouping()` while their grouping_id() conventions
    * differ — the assembled id is dialect-free. SQL path via
    * `parquet.` table syntax (the S13 surface; these dims need no ts
    * restoration). */
  def q202GroupingSets(s: SparkSession, dir: String): DataFrame =
    s.sql(s"""
      |SELECT coalesce(r_name, '<all>') AS region,
      |  coalesce(c_mktsegment, '<all>') AS segment,
      |  CAST(2 * grouping(r_name) + grouping(c_mktsegment) AS INT) AS gid,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS rev_cents
      |FROM parquet.`$dir/orders.parquet` o
      |JOIN parquet.`$dir/customer.parquet` c ON c.c_custkey = o.o_custkey
      |JOIN parquet.`$dir/nation.parquet` n ON n.n_nationkey = c.c_nationkey
      |JOIN parquet.`$dir/region.parquet` r ON r.r_regionkey = n.n_regionkey
      |GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name),
      |  (c_mktsegment), ())
      |ORDER BY gid, region, segment""".stripMargin)

  /** PIVOT event types into measure columns (extends §2.6; the explicit
    * value list keeps the output schema static — schema inference from
    * data would be a driver-side distinct scan). Catalyst rewrites this to
    * one conditional aggregation pass, which is also exactly how the
    * DuckDB oracle expresses it. */
  def q44Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("ts").cast("date").as("d"))
      .pivot("event_type", Seq("click", "view", "purchase", "error", "signup"))
      .agg(count(lit(1)).cast("bigint"))
      .select(col("d"),
        coalesce(col("click"), lit(0L)).as("click"),
        coalesce(col("view"), lit(0L)).as("view"),
        coalesce(col("purchase"), lit(0L)).as("purchase"),
        coalesce(col("error"), lit(0L)).as("error"),
        coalesce(col("signup"), lit(0L)).as("signup"))
      .orderBy("d")

  /** Approximate distinct count (HLL++) in an oracle-checkable shape:
    * sketch estimates differ across engines, so instead of emitting the raw
    * estimate the query emits the EXACT count (q38's two-phase form) plus
    * `sketch_ok` — whether the HLL estimate landed within a 10% relative
    * error bound. The sketch is configured for 2% standard error, so 10%
    * is 5 sigma — wide enough that normal sketch variance cannot flip the
    * oracle-facing boolean at any scale factor or seed;
    * OperatorPropertySpec asserts the tighter 5% bound on the fixtures.
    * Output is fully deterministic, so the DuckDB
    * oracle (exact counts + literal true) hash-matches while the sketch is
    * still genuinely exercised. At 100 TB the sketch is THE way to count
    * distincts — fixed-size state, merges map-side, no (key, value)
    * expansion shuffle; here it consumes phase 1's deduplicated rows, which
    * feed it the identical distinct set at no extra cost. */
  def q45ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(count(when(col("user_id").isNotNull, lit(1))).cast("bigint").as("n_users"),
           sum(col("n")).cast("bigint").as("n_events"),
           approx_count_distinct(col("user_id"), 0.02).as("approx_"))
      .select(col("event_type"), col("n_users"), col("n_events"),
        (abs(col("approx_") - col("n_users")).cast("double") <=
          col("n_users").cast("double") * 0.10).as("sketch_ok"))
      .orderBy("event_type")

  /** Analytic window suite (extends §2.7 — the reference has only the W1
    * moving average): lag/lead, rank/dense_rank, ntile, and a running sum,
    * all over ONE per-user window ordered by (ts, event_id) so every
    * function shares a single sort+shuffle. Total order on the output keys
    * keeps ties deterministic in both engines. */
  def q46WindowSuite(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    Tables.events(s, dir)
      .filter(col("user_id") < 20)
      .select(
        col("user_id"), col("event_id"),
        lag(col("value"), 1).over(w).as("prev_value_raw"),
        lead(col("value"), 1).over(w).as("next_value_raw"),
        rank().over(Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id")))
          .cast("int").as("value_rank"),
        dense_rank().over(Window.partitionBy("user_id").orderBy(col("event_type")))
          .cast("int").as("type_rank"),
        ntile(4).over(w).cast("int").as("quartile"),
        sum(dec6(col("value"))).over(w).cast("double").as("running_sum"))
      .select(col("user_id"), col("event_id"),
        coalesce(col("prev_value_raw"), lit(-1.0)).as("prev_value"),
        coalesce(col("next_value_raw"), lit(-1.0)).as("next_value"),
        col("value_rank"), col("type_rank"), col("quartile"), col("running_sum"))
      .orderBy("user_id", "event_id")
  }

  /** Semi/anti join pair (the two join types the rest of the suite doesn't
    * exercise; Catalyst's rewrite target for EXISTS / NOT EXISTS): orders
    * with and without a high-value lineitem. Both plan as one shuffle on
    * the join key with the semi/anti short-circuit — no fact-side
    * duplication, which is why EXISTS beats a join+distinct at scale. */
  def q47SemiAnti(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val big = Tables.lineitem(s, dir)
      .filter(col("l_extendedprice") > 4000)
      .select(col("l_orderkey"))
    val withBig = o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).cast("bigint").as("n_with"))
    val withoutBig = o.join(big, o("o_orderkey") === big("l_orderkey"), "left_anti")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).cast("bigint").as("n_without"))
    withBig.join(withoutBig, Seq("o_orderstatus"), "outer")
      .select(col("o_orderstatus"),
        coalesce(col("n_with"), lit(0L)).as("n_with"),
        coalesce(col("n_without"), lit(0L)).as("n_without"))
      .orderBy("o_orderstatus")
  }

  /** Exact interpolated percentiles per group (extends §2.6; verified
    * bit-identical to DuckDB's quantile_cont — both linearly interpolate
    * between the two order statistics around the target rank). Exact
    * percentile requires a per-group sort; at 100 TB the scale path is
    * approx_percentile's mergeable sketch (same tradeoff as q45), so this
    * is the small-group/final-report form. */
  def q49Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy("event_type")

  /** Mergeable-sketch percentiles — the 100 TB scale path q49's doc names,
    * now registered. `approx_percentile`'s Greenwald-Khanna sketch keeps
    * fixed-size mergeable state (map-side partial merge, no per-group
    * sort), the same exactness-for-scale trade as q45's HLL. Engines — and
    * merge orders — disagree on sketch OUTPUTS, so the oracle-facing
    * columns are the exact percentiles plus `sketch_ok`: whether each
    * approx value landed between the exact interpolated quantiles at
    * q ± 0.01. Unlike q45's probabilistic HLL envelope, this bound is
    * DETERMINISTIC: GK guarantees rank error <= 1/accuracy = 0.0001, and
    * the 0.01 rank envelope gives 100x slack — so sketch_ok is true
    * whenever the rank arithmetic is meaningful at all. For groups with
    * n < ~100 the sketch returns an actual element whose rank spacing
    * (1/n) exceeds the 0.01 envelope, so the envelope check says nothing;
    * the boolean short-circuits true below n = 200 to keep the oracle's
    * literal `true` decoupled from fixture scale. */
  def q51ApproxPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        expr("percentile(value, array(0.24, 0.26, 0.49, 0.51, 0.94, 0.96))").as("bounds"),
        expr("approx_percentile(value, array(0.25, 0.5, 0.95), 10000)").as("ap"),
        count(col("value")).as("n"))
      .select(col("event_type"), col("p25"), col("p50"), col("p95"),
        (col("n") < 200 ||
         (col("ap")(0).between(col("bounds")(0), col("bounds")(1)) &&
          col("ap")(1).between(col("bounds")(2), col("bounds")(3)) &&
          col("ap")(2).between(col("bounds")(4), col("bounds")(5)))).as("sketch_ok"))
      .orderBy("event_type")

  /** AS-OF join (point-in-time lookup) — the time-series operator the
    * DataFrame API lacks as a primitive: each 'error' event matched to the
    * same user's most recent 'click' at or before it (product analytics'
    * time-to-failure-from-last-interaction). Expressed in the SCALABLE
    * form: one shuffle on the entity key, a sorted window, and a
    * last(ignoreNulls) carry-forward — not a per-row range subquery, which
    * Catalyst can only plan as a broadcast-nested-loop. Ties (a click and
    * an error on the same microsecond) resolve by event_id order,
    * identically in the oracle's window. The same union-then-carry shape
    * generalizes to any quote/trade as-of pairing; -1 marks errors with no
    * prior click. */
  def q56AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .filter(col("event_type").isin("click", "error"))
      .withColumn("last_click_us",
        last(when(col("event_type") === "click", expr("unix_micros(ts)")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .select(col("user_id").cast("bigint").as("user_id"),
              col("event_id").cast("bigint").as("event_id"),
              coalesce(expr("unix_micros(ts)") - col("last_click_us"), lit(-1L))
                .cast("bigint").as("us_since_click"))
      .orderBy("user_id", "event_id")
  }

  /** Count-Min sketch, built entirely from DataFrame ops — the "novel
    * sketch" rung of the custom-operator ladder, and unlike q45's HLL or
    * q51's GK sketch it is DETERMINISTIC given its hash functions, so the
    * estimates themselves are oracle-checked, not just an error envelope.
    * Build: each event fans out to d=4 (row, md5-derived column) cells,
    * one groupBy sums the counters — the sketch is a 4x64 table that
    * merges by cell-wise addition (the 100 TB shape: fixed size, map-side
    * combinable, one shuffle on 256 cells). Probe: the bounded probe set's
    * cells broadcast-join the sketch; estimate = min over the 4 rows.
    * CMS guarantees estimate >= true count (collisions only inflate);
    * `overcount` exposes the collision error directly. */
  def q58CountMin(s: SparkSession, dir: String): DataFrame = {
    val d = 4
    val w = 64
    val ev = Tables.events(s, dir).select(col("user_id"))
    // ONE definition of the (row, column) cell mapping for build and probe
    // sides — the sketch is only correct because both hash identically
    def toCells(keys: DataFrame): DataFrame = keys
      .select(col("user_id"), explode(expr(s"sequence(0, ${d - 1})")).as("r"))
      .withColumn("c", expr(
        s"cast(conv(substring(md5(concat(cast(r as string), ':', cast(user_id as string))), 1, 2), 16, 10) as int) % $w"))
    val cms = toCells(ev).groupBy("r", "c").agg(count(lit(1)).as("cnt"))
    val probes = toCells(ev.filter(col("user_id") < 10).distinct())
    val est = cms.join(broadcast(probes), Seq("r", "c"))
      .groupBy("user_id").agg(min(col("cnt")).cast("bigint").as("cms_n"))
    val exact = ev.filter(col("user_id") < 10)
      .groupBy("user_id").agg(count(lit(1)).cast("bigint").as("exact_n"))
    exact.join(est, Seq("user_id"))
      .select(col("user_id").cast("bigint").as("user_id"), col("exact_n"),
        col("cms_n"), (col("cms_n") - col("exact_n")).cast("bigint").as("overcount"))
      .orderBy("user_id")
  }

  /** Bloom-filter membership, q58's sibling sketch and the mechanism
    * behind runtime join filtering: the build side's keys set k=3
    * md5-derived bits in a w=512 bitmap (a distinct over (bit) cells —
    * fixed size, OR-mergeable); a probe is a hit iff all 3 of its bits
    * are set, tested with one broadcast join + count. Probes mix present
    * ids with ids absent from the table, so the output shows true
    * negatives and any (deterministic) false positives — `bloom_hit` with
    * `actually_present` false IS the false-positive rate made visible.
    * At 100 TB this is the pre-shuffle filter: broadcast the 512-bit
    * bitmap, drop non-matching fact rows before the join exchange. */
  def q59BloomMembership(s: SparkSession, dir: String): DataFrame = {
    val k = 3
    val w = 512
    def bitsOf(d: DataFrame, idCol: String): DataFrame = d
      .select(col(idCol), explode(expr(s"sequence(0, ${k - 1})")).as("h"))
      .withColumn("pos", expr(
        s"cast(conv(substring(md5(concat(cast(h as string), '#', cast($idCol as string))), 1, 3), 16, 10) as int) % $w"))
    val keys = Tables.events(s, dir).select(col("user_id")).distinct()
    val bloom = bitsOf(keys, "user_id").select("pos").distinct()
    val probes = s.range(0, 10).select(col("id").as("probe_id"))
      .union(s.range(99990, 100000).select(col("id").as("probe_id")))
    val hits = bitsOf(probes, "probe_id")
      .join(bloom, Seq("pos"), "left_semi")
      .groupBy("probe_id").agg(count(lit(1)).as("n_bits"))
    val present = keys.select(col("user_id").as("probe_id")).withColumn("present", lit(true))
    probes
      .join(hits, Seq("probe_id"), "left")
      .join(present, Seq("probe_id"), "left")
      .select(col("probe_id").cast("bigint").as("probe_id"),
        (coalesce(col("n_bits"), lit(0L)) === k).as("bloom_hit"),
        coalesce(col("present"), lit(false)).as("actually_present"))
      .withColumn("false_positive", col("bloom_hit") && !col("actually_present"))
      .orderBy("probe_id")
  }

  /** AS-OF join core — for each row of the `probe` stream, the latest
    * STRICTLY-prior row of the `quote` stream with the same key (the
    * time-series join Spark has no built-in operator for; the reference's
    * analog is its weather-to-journey time alignment, which it solves by
    * rounding to shared calendar keys — `/root/reference/spark/
    * transform_load.py:129-137` — i.e. a coarsened special case).
    *
    * Spark-first shape (design-ladder tier a — composition, no custom
    * plan node needed): tag and UNION the two streams, one window per
    * key ordered by (ts, tag, id), and `last(_, ignoreNulls)` carries
    * the most recent quote values forward onto each probe row. ONE
    * shuffle on the key, state bounded by the window frame — never a
    * range cross-join, never a per-key collect. Probes sort BEFORE
    * quotes at equal ts (tag 0 < 1), which makes the match strictly
    * prior — the same semantics as the oracle's `ASOF ... ON p.ts >
    * t.ts`, an INDEPENDENT native implementation, so the hash gate
    * cross-checks the window construction against a real ASOF operator.
    * Tie-break inside equal-ts quote runs is the larger event_id (the
    * fixture has no duplicate (user_id, ts); AsofSpec pins the
    * constructed-tie semantics). */
  private[graft] def asofLastTouch(events: DataFrame): DataFrame = {
    val touches = events.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("tag"),
        col("event_id").as("sort_id"), col("event_id").as("t_event_id"),
        col("event_type").as("t_type"))
      .withColumn("p_event_id", lit(null).cast("long"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(0).as("tag"),
        col("event_id").as("sort_id"),
        lit(null).cast("long").as("t_event_id"),
        lit(null).cast("string").as("t_type"),
        col("event_id").as("p_event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("tag"), col("sort_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    touches.unionByName(purchases)
      .withColumn("lt_id", last(col("t_event_id"), ignoreNulls = true).over(w))
      .withColumn("lt_type", last(col("t_type"), ignoreNulls = true).over(w))
      .withColumn("lt_ts",
        last(when(col("tag") === 1, col("ts")), ignoreNulls = true).over(w))
      .filter(col("p_event_id").isNotNull)
      .select(col("p_event_id").cast("bigint").as("event_id"),
        col("user_id").cast("bigint").as("user_id"),
        col("lt_id").cast("bigint").as("touch_event_id"),
        col("lt_type").as("touch_type"),
        (expr("unix_micros(ts)") - expr("unix_micros(lt_ts)"))
          .cast("bigint").as("micros_since_touch"))
      .orderBy("event_id")
  }

  /** Last-touch attribution over the events stream: every purchase joined
    * as-of to the user's most recent strictly-prior non-purchase event. */
  def q99AsofJoin(s: SparkSession, dir: String): DataFrame =
    asofLastTouch(Tables.events(s, dir))

  /** Ordered funnel analysis over the events stream: how many users
    * progressed view → click → purchase IN THAT ORDER (each stage
    * strictly after the previous one — the product-analytics query the
    * reference's flat `COUNT GROUP BY` aggregations cannot express,
    * `/root/reference/sql/aggregations.sql`).
    *
    * ONE shuffle on user_id; the whole funnel is a chain of windows over
    * the same (user_id, ts, event_id) sort: the strictly-prior frame
    * carries "earliest view so far" onto each row, a click qualifies when
    * a view precedes it, the same frame then carries "earliest qualified
    * click so far", and a purchase qualifies when a qualified click
    * precedes it. Per-user state is three timestamps — no per-stage
    * re-join, no self-join on the events fact, order-insensitive mins
    * throughout. The 3-row output is unpivoted from one aggregate row. */
  private[graft] def funnelStages(events: DataFrame): DataFrame = {
    val wPrior = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val perUser = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rv",
        min(when(col("event_type") === "view", col("ts"))).over(wPrior))
      .withColumn("cand_c",
        when(col("event_type") === "click" && col("ts") > col("rv"), col("ts")))
      .withColumn("rc", min(col("cand_c")).over(wPrior))
      .withColumn("cand_p",
        when(col("event_type") === "purchase" && col("ts") > col("rc"), col("ts")))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("v_ts"),
        min("cand_c").as("c_ts"),
        min("cand_p").as("p_ts"))
    perUser.agg(
        count(col("v_ts")).as("n_v"),
        count(col("c_ts")).as("n_c"),
        count(col("p_ts")).as("n_p"))
      .select(expr(
        "stack(3, 1, 'view', n_v, cast(1.0 as double), " +
          "2, 'view_click', n_c, cast(n_c as double) / cast(n_v as double), " +
          "3, 'view_click_purchase', n_p, cast(n_p as double) / cast(n_c as double)) " +
          "as (stage_order, stage, n_users, conv_from_prev)"))
      .select(col("stage_order").cast("int").as("stage_order"), col("stage"),
        col("n_users").cast("bigint").as("n_users"), col("conv_from_prev"))
      .orderBy("stage_order")
  }

  def q103Funnel(s: SparkSession, dir: String): DataFrame =
    funnelStages(Tables.events(s, dir))

  /** Per-type Pearson correlation between event value and hour-of-day —
    * the statistical-profiling pass a pipeline runs before trusting a
    * numeric column, computed DETERMINISTICALLY: `corr()` built-ins
    * accumulate doubles in partition order (nondeterministic across
    * partitionings, unhashable across engines), so the moments are
    * gathered as EXACT integer sums instead — value quantized to
    * micro-units (bigint), hour as int, the five sums in decimal(38,0)
    * (order-free integer addition, map-side combinable) — and the
    * correlation assembled once per group in double with a fixed
    * operation order mirrored by the oracle. The q95/recenter
    * fixed-point rule applied to second moments. */
  def q110ValueHourCorr(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        expr("cast(floor(value * 1e6) as bigint)").as("x"),
        expr("cast(hour(ts) as bigint)").as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(expr("cast(x as decimal(38,0))")).as("sx"),
        sum(expr("cast(y as decimal(38,0))")).as("sy"),
        sum(expr("cast(x as decimal(38,0)) * cast(x as decimal(38,0))")).as("sxx"),
        sum(expr("cast(y as decimal(38,0)) * cast(y as decimal(38,0))")).as("syy"),
        sum(expr("cast(x as decimal(38,0)) * cast(y as decimal(38,0))")).as("sxy"))
      .select(col("event_type"), col("n"),
        expr("cast(sx as double) / (1e6 * cast(n as double))").as("mean_value"),
        expr("cast(sy as double) / cast(n as double)").as("mean_hour"),
        expr("cast(n * sxy - sx * sy as double) / " +
          "(sqrt(cast(n * sxx - sx * sx as double)) * " +
          "sqrt(cast(n * syy - sy * sy as double)))").as("corr"))
      .orderBy("event_type")

  /** CUBE aggregation (all four grouping combinations of event type ×
    * 6-hour band in one pass — q43's ROLLUP sibling, the other
    * grouping-sets operator the reference's flat GROUP BYs never need
    * but any BI layer on top of the warehouse does). Spark plans the
    * Expand + single aggregate; the null grouping markers are coalesced
    * to sentinels BOTH sides since neither column is nullable. */
  def q114Cube(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("hband", expr("cast(hour(ts) div 6 as int)"))
      .cube("event_type", "hband")
      .agg(count(lit(1)).cast("bigint").as("cnt"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("hband"), lit(-1)).as("hband"), col("cnt"))
      .orderBy("event_type", "hband")

  /** INTERSECT / EXCEPT set operators over per-type user sets: users who
    * both clicked and purchased vs clicked-only — the funnel question
    * (q103) phrased in set algebra, exercising the two bag/set operators
    * the board's UNION (q13) and semi/anti joins (q47) do not. Both plan
    * as hash aggregates over a tagged union — one shuffle each. */
  def q115SetOps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def users(t: String) =
      ev.filter(col("event_type") === t).select("user_id").distinct()
    val both = users("click").intersect(users("purchase"))
      .withColumn("relation", lit("click_and_purchase"))
    val only = users("click").except(users("purchase"))
      .withColumn("relation", lit("click_no_purchase"))
    both.unionByName(only)
      .groupBy("relation")
      .agg(count(lit(1)).cast("bigint").as("n_users"),
        min("user_id").cast("bigint").as("min_user"),
        max("user_id").cast("bigint").as("max_user"))
      .orderBy("relation")
  }

  /** Value-bucket width for [[q116RelativeRank]]'s distributed rank:
    * unit-wide buckets over the fixture's value range (~[0, 330]) give a
    * few hundred ordered buckets per type — the bucket-summary window
    * stays bounded while no single (type, bucket) partition holds more
    * than 1/width of a type's rows. Production tunes this the way
    * packBucketWidth is tuned for q68: granularity is the design input
    * that bounds the largest intra-bucket sort. */
  private val q116BucketExpr = "cast(floor(value) as bigint)"

  /** Relative-rank analytics (percent_rank, cume_dist — the two window
    * functions q46's suite leaves out): each event's standing within its
    * type by value, in the two-phase distributed form. A literal
    * `percent_rank() OVER (PARTITION BY event_type ORDER BY value)` puts
    * every event of a type into ONE window partition — event_type is a
    * bounded enum, so that task holds the type's ENTIRE history at scale
    * (the q68 straggler, which StragglerGuardSpec now bans board-wide).
    * Instead, the q68/q111 discipline:
    *   1. per-(type, value-bucket) counts — a normal scaling groupBy;
    *   2. a window over the BUCKET SUMMARIES (types x a few hundred
    *      buckets) yields each bucket's rank offset and the per-type
    *      total n;
    *   3. the per-row rank is offset + row_number within one
    *      (type, bucket) — a bounded partition;
    *   4. percent_rank = (rank-1)/(n-1), cume_dist = rank/n assembled
    *      arithmetically (the ordering (value, event_id) is TOTAL, so
    *      rank == row_number and a row's only peer is itself — both
    *      identities are exact, and the double divisions are the same
    *      two divisions the native functions perform, so the result is
    *      bit-identical to the one-window form; RelativeRankSpec asserts
    *      it against the naive plan on the fixtures).
    * Output bounded to the top decile per type to keep the gate small. */
  def q116RelativeRank(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("vb", expr(q116BucketExpr))
    val wOff = Window.partitionBy("event_type").orderBy("vb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy("event_type")
    val summaries = base.groupBy("event_type", "vb")
      .agg(count(lit(1)).as("bc"))
      .withColumn("off", coalesce(sum("bc").over(wOff), lit(0L)))
      .withColumn("n", sum("bc").over(wTot))
      .select("event_type", "vb", "off", "n")
    val wIntra = Window.partitionBy("event_type", "vb")
      .orderBy(col("value"), col("event_id"))
    base
      .withColumn("irn", row_number().over(wIntra))
      .join(broadcast(summaries), Seq("event_type", "vb"))
      .withColumn("rn", col("off") + col("irn"))
      .withColumn("pr", when(col("n") > 1,
        expr("cast(rn - 1 as double) / cast(n - 1 as double)")).otherwise(lit(0.0)))
      .withColumn("cd", expr("cast(rn as double) / cast(n as double)"))
      .filter(col("pr") >= 0.9)
      .select(col("event_type"), col("event_id").cast("bigint").as("event_id"),
        col("value"), col("pr"), col("cd"))
      .orderBy("event_type", "event_id")
  }

  /** The naive one-window form of [[q116RelativeRank]] — what the oracle
    * runs. Kept (test-only) as the equivalence baseline; NOT registered:
    * at scale each event_type is one window partition. */
  private[graft] def relativeRankNaive(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .filter(col("pr") >= 0.9)
      .select(col("event_type"), col("event_id").cast("bigint").as("event_id"),
        col("value"), col("pr"), col("cd"))
      .orderBy("event_type", "event_id")
  }

  /** KMV sketch SET ALGEBRA — cross-audience overlap from mergeable
    * summaries (the scale path beside q90's exact source overlap and
    * q115's exact set ops): per-type user sketches (`graft_kmv`), pair
    * UNION sketches built columnar from the per-type sketches alone
    * (k smallest of the merged kept-sets — no re-scan of the fact
    * table, which is the entire point of a mergeable sketch), and the
    * intersection estimated by inclusion–exclusion. Exact counts ride
    * along (the q101 discipline) so the driver hash-checks the sketch
    * arithmetic AND the rel_err column keeps the estimator honest.
    *
    * Determinism: the estimator reads the k-th smallest of a
    * deterministic hash set — no RNG, no float accumulation order; the
    * oracle replays the identical k-smallest selection with window
    * functions. Scale: one (type, user) distinct shuffle + one user_id
    * equi-join for the exact side; the sketch side after aggregation is
    * 5 rows of k values — the pair expansion is a bounded broadcast
    * (types x types), never a data join. At 100 TB only the exact
    * columns cost anything; a production caller drops them and keeps
    * the sketch algebra, constant-size per key. */
  def q117SketchOverlap(s: SparkSession, dir: String): DataFrame = {
    val k = 32
    val users = Tables.events(s, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .withColumn("h", expr(
        "cast(conv(substring(md5(concat('kmvu_', cast(user_id as string))), 1, 8), 16, 10) as bigint)"))
    val perType = users.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"), expr(s"graft_kmv(h, $k)").as("ks"))
    def est(ks: String) =
      s"case when size($ks) < $k then cast(size($ks) as double) " +
        s"else (${k - 1}.0 * 4294967296.0) / cast(element_at($ks, $k) as double) end"
    val pa = perType.select(col("event_type").as("ta"),
      col("n").as("n_a"), col("ks").as("ksa"))
    val pb = perType.select(col("event_type").as("tb"),
      col("n").as("n_b"), col("ks").as("ksb"))
    val pairs = pa.join(broadcast(pb), col("ta") < col("tb"))
      // KMV union = k smallest of the merged kept-sets (sketch algebra,
      // exactly the k smallest of the full hash union by containment)
      .withColumn("ksu",
        expr(s"slice(array_sort(array_distinct(concat(ksa, ksb))), 1, $k)"))
    val ua = users.select(col("event_type").as("ta"), col("user_id"))
    val ub = users.select(col("event_type").as("tb"), col("user_id"))
    val both = ua.join(ub, "user_id").filter(col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("nb_raw"))
    pairs.join(broadcast(both), Seq("ta", "tb"), "left")
      .withColumn("n_both", coalesce(col("nb_raw"), lit(0L)))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_both"))
      .withColumn("est_a", expr(est("ksa")))
      .withColumn("est_b", expr(est("ksb")))
      .withColumn("est_union", expr(est("ksu")))
      .withColumn("est_intersect", expr("est_a + est_b - est_union"))
      .withColumn("rel_err_union",
        expr("abs(est_union - cast(n_union as double)) / cast(n_union as double)"))
      .select(col("ta"), col("tb"),
        col("n_a").cast("bigint").as("n_a"), col("n_b").cast("bigint").as("n_b"),
        col("n_both").cast("bigint").as("n_both"),
        col("n_union").cast("bigint").as("n_union"),
        col("est_a"), col("est_b"), col("est_union"), col("est_intersect"),
        col("rel_err_union"))
      .orderBy("ta", "tb")
  }

  /** Cohort retention matrix — the user-lifecycle analytics every event
    * warehouse serves (reference analog: the per-period aggregation
    * family in `/root/reference/sql/aggregations.sql`, extended to the
    * cohort x offset grid): users cohorted by FIRST activity day, then
    * each (cohort, day-offset) cell counts the cohort members active
    * that day, with the retention rate as one deterministic division
    * against the offset-0 cell.
    *
    * Scale: the cohort assignment is a user_id groupBy and the
    * matrix join is a user_id equi-join — both on the entity key, never
    * a bounded one; the retention window runs over the AGGREGATED
    * cohort x offset grid (days x days rows), never over events. */
  def q118CohortRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr("cast(ts as date)").as("d"))
    val cohorts = ev.groupBy("user_id").agg(min("d").as("cohort"))
    val grid = ev.join(cohorts, Seq("user_id"))
      .withColumn("off", datediff(col("d"), col("cohort")))
      .groupBy("cohort", "off")
      .agg(countDistinct("user_id").as("n_users"))
    val w = Window.partitionBy("cohort")
    grid
      .withColumn("cohort_size",
        max(when(col("off") === 0, col("n_users"))).over(w))
      .withColumn("retention",
        expr("cast(n_users as double) / cast(cohort_size as double)"))
      .select(expr("cast(cohort as string)").as("cohort_day"),
        col("off").cast("int").as("day_offset"),
        col("n_users").cast("bigint").as("n_users"),
        col("cohort_size").cast("bigint").as("cohort_size"),
        col("retention"))
      .orderBy("cohort_day", "day_offset")
  }

  /** First-order event-transition matrix (sequence mining's base
    * primitive, and the sanity check behind any session-based model):
    * per-user event streams in (ts, event_id) order yield (prev, next)
    * bigrams via one lag over the user window; counts and row-normalized
    * transition probabilities follow. The probability division is one
    * deterministic double op over integer sums.
    *
    * Scale: the lag window partitions by user_id (entity key — the q39
    * sessionize shape); the transition aggregate and its normalizing
    * window run over the bounded types x types grid. */
  def q119EventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", expr(
        "cast(n as double) / cast(sum(n) over (partition by from_type) as double)"))
      .select(col("from_type"), col("to_type"),
        col("n").cast("bigint").as("n"), col("p"))
      .orderBy("from_type", "to_type")
  }

  /** Hopping (sliding) window aggregation — the batch analog of a
    * streaming windowed agg with slide < width (q36 covers tumbling):
    * 6-hour windows every 3 hours, so each event lands in exactly
    * width/hop windows. Implemented as the explode-arithmetic form
    * (sequence + integer window-start derivation) rather than Spark's
    * `window()` so the window assignment is ENGINE-PARITY ARITHMETIC the
    * oracle replays digit for digit — the plan shape is the same Expand
    * + hash-aggregate the built-in plans, and every step is codegen'd
    * integer math. Window starts emit as epoch micros (formatting is
    * presentation, not semantics).
    *
    * Scale: the explode multiplies rows by width/hop (2 here) BEFORE the
    * partial aggregate collapses them to (type, window) cells — the
    * expansion never shuffles; only per-cell partials do. */
  def q121HoppingWindows(s: SparkSession, dir: String): DataFrame = {
    val hopUs = 3L * 3600 * 1000000
    val widthUs = 6L * 3600 * 1000000
    val perEvent = widthUs / hopUs // windows containing each event
    Tables.events(s, dir)
      .select(col("event_type"), expr("unix_micros(ts)").as("t"),
        col("value"))
      .select(col("event_type"), col("t"), col("value"),
        explode(expr(s"sequence(0, ${perEvent - 1}L)")).as("i"))
      .withColumn("window_start_us",
        expr(s"(t div ${hopUs}L - i) * ${hopUs}L"))
      .groupBy("event_type", "window_start_us")
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(dec6(col("value"))).cast("double").as("sum_value"))
      .orderBy("event_type", "window_start_us")
  }

  /** Per-user event-sequence assembly — the denormalized "pack an
    * entity's ordered history into one record" export every
    * conversational / behavioral training pipeline ends with (sessions
    * become training sequences). The assembled sequence is verified by
    * HASH: each user's events sort on the total (t, event_id) order
    * inside the array (`array_sort` over structs sorts field-wise —
    * deterministic regardless of arrival order), render canonically,
    * and digest. The oracle builds the identical string with an ordered
    * string_agg, so the hash gate proves ASSEMBLY-LEVEL equality, not
    * just aggregate equality.
    *
    * Scale: one user_id shuffle (entity key); per-user state is that
    * user's history — inherent to the export (a production run caps or
    * chunks pathological users upstream, the q73 chunking op). */
  def q122SequenceAssembly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("t"))
      .groupBy("user_id")
      .agg(count(lit(1)).cast("bigint").as("n_events"),
        min("t").cast("bigint").as("first_t"),
        max("t").cast("bigint").as("last_t"),
        expr("md5(concat_ws('|', transform(" +
          "array_sort(collect_list(struct(t, event_id, event_type))), " +
          "x -> concat(x.t, ':', x.event_id, ':', x.event_type))))")
          .as("seq_md5"))
      .select(col("user_id").cast("bigint").as("user_id"), col("n_events"),
        col("first_t"), col("last_t"), col("seq_md5"))
      .orderBy("user_id")

  /** Explicit GROUPING SETS — the third grouping-sets operator beside
    * ROLLUP (q43) and CUBE (q114): an arbitrary, non-hierarchical set
    * list ((type), (band), ()) that neither shorthand expresses, plus
    * the GROUPING() marker function that distinguishes "null because
    * aggregated over" from a genuinely null key. Runs through the SQL
    * path (q35's S13 surface — the DataFrame API spells this
    * `.cube`/`.rollup` only). One Expand + one aggregate, like its
    * siblings. */
  def q128GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("hband", expr("cast(hour(ts) div 6 as int)"))
      .createOrReplaceTempView("graft_q128_events")
    s.sql("""
      SELECT coalesce(event_type, 'ALL') AS event_type,
             coalesce(hband, -1) AS hband,
             cast(grouping(event_type) AS int) AS g_type,
             cast(grouping(hband) AS int) AS g_band,
             cast(count(*) AS bigint) AS cnt
      FROM graft_q128_events
      GROUP BY GROUPING SETS ((event_type), (hband), ())
      ORDER BY event_type, hband""")
  }

  /** Conditional / argument aggregate suite — the §2.6 surface corners a
    * BI user reaches for weekly: count_if, bool_and/bool_or gates, and
    * max_by/min_by argument selection. Determinism rule: the *_by
    * ordering argument is the UNIQUE event_id (value at the
    * latest/earliest event), because arg-selection over a tied ordering
    * key is engine-arbitrary — the one semantic trap of this family,
    * documented by construction here. One shuffle on the bounded type
    * key with map-side partials. */
  def q129ConditionalAggs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).cast("bigint").as("n"),
        expr("count_if(value > 100.0)").cast("bigint").as("n_over_100"),
        expr("bool_and(value > 0.0)").as("all_positive"),
        expr("bool_or(value > 300.0)").as("any_over_300"),
        expr("max_by(value, event_id)").as("latest_value"),
        expr("min_by(value, event_id)").as("earliest_value"),
        min("value").as("min_value"), max("value").as("max_value"))
      .orderBy("event_type")

  /** MAP-typed column surface — the semi-structured sidecar parsed to a
    * real MAP (q78 projects one known field; operations over the map
    * ITSELF — cardinality, key set, lookup — are what a dynamic-schema
    * properties column needs): `from_json` to MAP<STRING,INT>, then
    * size / map_keys / element_at, all codegen'd. The oracle reads the
    * same facts through DuckDB's JSON functions (json_keys, ->> path
    * lookup) — different machinery, same answers, which is the point of
    * the parity check. One scan, one bounded per-type aggregate. */
  def q130MapSuite(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("m", expr("from_json(props, 'map<string,int>')"))
      .select(col("event_type"),
        expr("size(m)").as("n_keys"),
        expr("concat_ws(',', array_sort(map_keys(m)))").as("key_set"),
        expr("coalesce(element_at(m, 'k'), 0)").as("k_val"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum("n_keys").cast("bigint").as("sum_keys"),
        countDistinct("key_set").cast("bigint").as("n_key_sets"),
        min("key_set").as("min_key_set"),
        sum("k_val").cast("bigint").as("sum_k"))
      .orderBy("event_type")

  /** Market-basket co-occurrence — the association-mining primitive
    * (top part pairs sharing an order) and the canonical BOUNDED
    * self-join: lineitem joins itself on l_orderkey, whose per-key
    * fanout is the lines-per-order distribution (TPC-H ~4, never
    * corpus-scale), so pair cardinality is sum(n_i choose 2) — linear
    * in orders, not quadratic in lineitem. The same query against an
    * UNBOUNDED key would be the q22-family's job (LSH candidates);
    * choosing the join by key-fanout is the design rule this query
    * records. Distinct parts per order first (a part twice in one order
    * is one basket membership), pairs oriented a < b, global top-20 by
    * TakeOrderedAndProject. */
  def q132MarketBasket(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val a = li.select(col("ok"), col("pk").as("part_a"))
    val b = li.select(col("ok"), col("pk").as("part_b"))
    a.join(b, Seq("ok"))
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).cast("bigint").as("n_orders"))
      .orderBy(desc("n_orders"), col("part_a"), col("part_b"))
      .limit(20)
      .select(col("part_a").cast("bigint").as("part_a"),
        col("part_b").cast("bigint").as("part_b"), col("n_orders"))
  }

  /** ASSOCIATION RULES over the q132 basket pairs — support, directed
    * confidence, and lift for every part pair co-purchased in ≥2
    * orders, both rule directions emitted from one pair frame. The
    * classic frequent-itemset readout at the k=2 level, mined on the
    * same bounded-fanout self-join q132 records as the design rule
    * (pair volume linear in orders — an unbounded key would need the
    * LSH candidate machinery instead).
    *
    * Determinism: counts are exact BIGINTs; confidence and lift are
    * single mirrored double chains (floor-quantized to e6), with lift
    * computed as double(n_ab)·double(N) / (double(n_a)·double(n_b)) —
    * products taken in DOUBLE so no BIGINT overflow at any corpus
    * size, the identical IEEE op order in both engines. One driver
    * scalar (the basket count N — the q19 mirror class); item counts
    * join the pair frame on the part key. Top-50 under the total
    * (support DESC, antecedent, consequent) order. */
  def q188AssociationRules(s: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    // Round-15 optimization: the basket count was a separate driver
    // count() job — a full extra lineitem pass + distinct shuffle before
    // the main query — only to embed N as a plan literal. It now rides
    // the main plan as a broadcast single-row aggregate (same exact
    // BIGINT, cast to the same double in the same lift expression), so
    // the query is ONE job. See OPTIMIZATION_r15.md.
    val nBasketsDf = baskets.select("ok").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val items = baskets.groupBy("pk").agg(count(lit(1)).as("n_item"))
    val a = baskets.select(col("ok"), col("pk").as("pa"))
    val b = baskets.select(col("ok"), col("pk").as("pb"))
    val pairs = a.join(b, Seq("ok"))
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    val rules = pairs
      .select(explode(expr(
        "array(named_struct('ante', pa, 'cons', pb, 'n_ab', n_ab), " +
          "named_struct('ante', pb, 'cons', pa, 'n_ab', n_ab))")).as("r"))
      .select(col("r.ante").as("ante"), col("r.cons").as("cons"),
        col("r.n_ab").as("n_ab"))
    rules
      .join(items.select(col("pk").as("ante"), col("n_item").as("n_ante")), Seq("ante"))
      .join(items.select(col("pk").as("cons"), col("n_item").as("n_cons")), Seq("cons"))
      .crossJoin(broadcast(nBasketsDf))
      .select(col("ante").cast("bigint").as("antecedent"),
        col("cons").cast("bigint").as("consequent"),
        col("n_ante").cast("bigint").as("n_ante"),
        col("n_cons").cast("bigint").as("n_cons"),
        col("n_ab").cast("bigint").as("n_both"),
        floor(col("n_ab").cast("double") / col("n_ante").cast("double")
          * lit(1000000.0)).cast("bigint").as("conf_e6"),
        floor(col("n_ab").cast("double") * col("n_baskets").cast("double") /
          (col("n_ante").cast("double") * col("n_cons").cast("double"))
          * lit(1000000.0)).cast("bigint").as("lift_e6"))
      .orderBy(desc("n_both"), col("antecedent"), col("consequent"))
      .limit(50)
  }

  /** Referential-integrity audit — the warehouse data-quality sweep
    * (§2.13 extension) that must run before any star-join is trusted:
    * per FK relation, the count of child keys with no parent row, as
    * one ANTI-join per relation on the FK itself (distinct keys first,
    * so the shuffle carries key sets, not fact rows). Zero orphans is
    * the expected fixture answer — the AUDIT, not the orphans, is the
    * operator. At 100 TB each relation costs one key-distinct + one
    * anti-join on a scaling key. */
  def q133IntegrityAudit(s: SparkSession, dir: String): DataFrame = {
    def orphans(name: String, child: DataFrame, key: String,
                parent: DataFrame, pkey: String): DataFrame =
      child.select(col(key)).distinct()
        .join(parent.select(col(pkey).as(key)).distinct(), Seq(key), "left_anti")
        .agg(count(lit(1)).cast("bigint").as("n_orphans"))
        .withColumn("relation", lit(name))
    orphans("lineitem->orders", Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey")
      .unionByName(orphans("orders->customer", Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir), "c_custkey"))
      .unionByName(orphans("customer->nation", Tables.customer(s, dir), "c_nationkey",
        Tables.nation(s, dir), "n_nationkey"))
      .select(col("relation"), col("n_orphans"))
      .orderBy("relation")
  }

  /** Join-key SKEW profile — the pre-join audit behind every salting /
    * AQE-skew decision (SCALE.md's skew section, as a first-class
    * operator): the key-frequency distribution of lineitem's part key —
    * max, p50/p99 (exact `percentile`, bit-identical to DuckDB's
    * quantile_cont per the q49/q96 proof), and the top-1 key's share of
    * all rows. One groupBy on the key, then constant-size aggregation
    * over the key-frequency table; at a 1e9-key domain the percentile
    * swaps for the q51 sketch, noted here as the scale path. */
  /** q249 — JOIN-CARDINALITY pre-audit: the EXACT output size of a
    * prospective equi-join (events ⋈ orders on the customer key),
    * computed WITHOUT materializing the join — |A ⋈ B| = Σ_k
    * c_A(k)·c_B(k) over per-key counts — plus the top contributing key
    * and its output share. q134 profiles ONE side's skew; this is the
    * two-sided question a planner actually asks before committing a
    * 100 TB shuffle ("is this join 3× my input or 3000×, and is one
    * key responsible?") — the input to every broadcast/salt/AQE
    * decision, at the cost of two aggregations instead of the join.
    *
    * Scale shape: two map-side-combinable groupBys on the scaling join
    * key, then an equi-join of the DISTINCT-KEY frames (orders of
    * magnitude smaller than the fact tables; inner join because a key
    * absent from either side contributes zero pairs), one bounded
    * global aggregate, and a top-5 TakeOrderedAndProject unioned back
    * as audit rows. All counts exact BIGINTs; contribution products
    * bounded by max_freq_A · max_freq_B (fixture ≤ 2e5·2e5; decimal
    * widening past ~3e9·3e9, the q187 note). */
  def q249JoinCardinality(s: SparkSession, dir: String): DataFrame = {
    val ca = Tables.events(s, dir)
      .groupBy(col("user_id").as("k")).agg(count(lit(1)).as("ca"))
    val cb = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("cb"))
    val contrib = ca.join(cb, Seq("k"))
      .select(col("k").cast("bigint").as("k"),
        col("ca").cast("bigint").as("ca"), col("cb").cast("bigint").as("cb"),
        (col("ca") * col("cb")).cast("bigint").as("pairs"))
    val totals = contrib.agg(
      count(lit(1)).cast("bigint").as("n_join_keys"),
      sum("pairs").cast("bigint").as("total_pairs"),
      max("pairs").cast("bigint").as("max_pairs"))
    val top = contrib.orderBy(desc("pairs"), asc("k")).limit(5)
      .crossJoin(broadcast(totals))
      .select(lit("key").as("row_kind"), col("k"), col("ca"), col("cb"),
        col("pairs"),
        expr("(1000000 * pairs) div total_pairs").cast("bigint").as("share_e6"))
    val summary = totals
      .select(lit("total").as("row_kind"), lit(-1L).as("k"),
        col("n_join_keys").as("ca"), col("max_pairs").as("cb"),
        col("total_pairs").as("pairs"),
        expr("(1000000 * max_pairs) div total_pairs").cast("bigint")
          .as("share_e6"))
    summary.unionAll(top).orderBy(col("row_kind"), desc("pairs"), asc("k"))
  }

  def q134SkewProfile(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_partkey").agg(count(lit(1)).as("f"))
      .agg(count(lit(1)).cast("bigint").as("n_keys"),
        sum("f").cast("bigint").as("total_rows"),
        max("f").cast("bigint").as("max_freq"),
        expr("percentile(f, 0.5)").as("p50_freq"),
        expr("percentile(f, 0.99)").as("p99_freq"))
      .withColumn("top1_share",
        expr("cast(max_freq as double) / cast(total_rows as double)"))

  /** Time-series GAP detection (gaps-and-islands) — the missing-data
    * audit a pipeline runs on its event feed: per type, active hours,
    * span, missing-hour count, and the LONGEST outage (max consecutive
    * missing hours), from one lag over the per-(type, hour) aggregate —
    * the window runs over hourly summary rows (span/3600 per type),
    * never events, so the bounded-enum partition is guard-legal by the
    * summaries rule. All integer hour arithmetic. */
  def q135GapDetection(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("hr")
    hourly
      .withColumn("gap_before", col("hr") - lag("hr", 1).over(w) - 1)
      .groupBy("event_type")
      .agg(count(lit(1)).cast("bigint").as("n_hours_active"),
        min("hr").cast("bigint").as("first_hr"),
        max("hr").cast("bigint").as("last_hr"),
        coalesce(max("gap_before"), lit(0L)).cast("bigint").as("max_gap_hours"))
      .withColumn("span_hours", col("last_hr") - col("first_hr") + 1)
      .withColumn("n_gap_hours", col("span_hours") - col("n_hours_active"))
      .select(col("event_type"), col("n_hours_active"), col("first_hr"),
        col("last_hr"), col("span_hours").cast("bigint").as("span_hours"),
        col("n_gap_hours").cast("bigint").as("n_gap_hours"),
        col("max_gap_hours"))
      .orderBy("event_type")
  }

  /** Latest-wins (SCD Type-1) snapshot — the upsert-compaction view
    * every CDC/event stream needs beside q102's history-keeping SCD2:
    * each user's CURRENT state is the attributes of their latest event
    * under the total (ts, event_id) order. Implemented as ONE max_by
    * aggregate per attribute over a struct ordering key — one shuffle
    * with map-side partials, no window, no self-join (the row_number
    * form pays a per-user sort; the aggregate form is the compaction a
    * merge-on-read table format runs, expressed relationally). The
    * ordering key includes the unique event_id, so tied timestamps
    * cannot make the arg selection engine-arbitrary (the q129 rule) —
    * encoded as a zero-padded sortable STRING because that composite
    * ordering is the one form BOTH engines' arg-selection aggregates
    * accept (Spark's max_by takes a struct, DuckDB's arg_max does not;
    * fixed-width decimal strings order identically to the integers). */
  def q136LatestWins(s: SparkSession, dir: String): DataFrame = {
    val ord = "concat(lpad(cast(unix_micros(ts) as string), 20, '0'), ':', " +
      "lpad(cast(event_id as string), 20, '0'))"
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).cast("bigint").as("n_events"),
        expr(s"max_by(event_type, $ord)").as("last_type"),
        expr(s"max_by(value, $ord)").as("last_value"),
        expr(s"max_by(event_id, $ord)").cast("bigint").as("last_event_id"),
        expr("date_format(max(ts), 'yyyy-MM-dd HH:mm:ss')").as("last_ts"))
      .select(col("user_id").cast("bigint").as("user_id"), col("n_events"),
        col("last_type"), col("last_value"), col("last_event_id"), col("last_ts"))
      .orderBy("user_id")
  }

  /** DuckDB has no base-16 conv(); numeric value of the first n hex
    * digits of md5(x) via nibble Horner (the shared oracle idiom). */
  private def duckMd5Int(x: String, n: Int): String =
    (1 to n).foldLeft("CAST(0 AS BIGINT)") { (acc, i) =>
      s"(($acc) * 16 + (strpos('0123456789abcdef', substr(md5($x), $i, 1)) - 1))"
    }

  // ---------------------------------------------------------------- q160

  /** Candidate-key UNIQUENESS audit across the whole warehouse — for
    * each table's declared key, total rows vs distinct key values and
    * the verdict. The constraint-side companion to q133's referential
    * integrity (FKs point AT these keys; this proves the targets are
    * actually keys) and the profiling step a loader runs before
    * declaring a primary key or choosing a bucketing column.
    *
    * Scale: one COUNT(DISTINCT key) per table — Spark plans each as the
    * two-level expand/partial-aggregate on the key (scaling, map-side
    * combinable); the union is 8 one-row frames. */
  def q160UniquenessAudit(s: SparkSession, dir: String): DataFrame = {
    def audit(table: String, df: DataFrame, keyCols: Seq[String]): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          countDistinct(keyCols.head, keyCols.tail: _*).as("n_distinct"))
        .select(lit(table).as("table_name"),
          lit(keyCols.mkString(",")).as("key_cols"),
          col("n_rows").cast("bigint").as("n_rows"),
          col("n_distinct").cast("bigint").as("n_distinct"),
          (col("n_rows") === col("n_distinct")).as("is_unique"))
    Seq(
      audit("customer", Tables.customer(s, dir), Seq("c_custkey")),
      audit("documents", Tables.documents(s, dir), Seq("doc_id")),
      audit("embeddings", Tables.embeddings(s, dir), Seq("vec_id")),
      audit("events", Tables.events(s, dir), Seq("event_id")),
      audit("lineitem", Tables.lineitem(s, dir), Seq("l_orderkey", "l_linenumber")),
      audit("orders", Tables.orders(s, dir), Seq("o_orderkey")),
      audit("part", Tables.part(s, dir), Seq("p_partkey")),
      audit("supplier", Tables.supplier(s, dir), Seq("s_suppkey")),
    ).reduce(_ unionAll _).orderBy("table_name")
  }

  // ---------------------------------------------------------------- q168

  /** NULL-semantics parity suite — the dialect corner the other parity
    * suites (q127 arrays, q130 maps, q131 regex, q142 calendar) leave
    * out, pinned to the Spark ∩ DuckDB intersection. The fixture has no
    * physical nulls, so the suite manufactures them deterministically
    * (nullif on a real enum; CASE on a real measure) and then exercises
    * the semantics that differ across engines in the wild: COUNT(col)
    * vs COUNT(*), COUNT(DISTINCT col) null exclusion, MIN/MAX null
    * skipping, SUM over an all-null group (NULL, coalesced), null-safe
    * equality (Spark `<=>` == DuckDB IS NOT DISTINCT FROM), null
    * GROUPING key membership, and pinned NULLS FIRST presentation
    * order. All aggregates are BIGINT-exact (quantity is an integral
    * double). Narrow scan → one grouped aggregate — nothing here costs
    * more than q01 at any scale. */
  def q168NullSemantics(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        expr("nullif(l_returnflag, 'N')").as("nl"),
        expr("case when l_quantity > 40 then cast(null as bigint) " +
          "else cast(l_quantity as bigint) end").as("nv"))
      .groupBy("nl")
      .agg(count(lit(1)).cast("bigint").as("n_rows"),
        count(col("nv")).cast("bigint").as("n_nv_nonnull"),
        sum(when(col("nv").isNull, 1L).otherwise(0L)).cast("bigint")
          .as("n_nv_null"),
        countDistinct(col("nv")).cast("bigint").as("nd_nv"),
        min("nv").cast("bigint").as("min_nv"),
        max("nv").cast("bigint").as("max_nv"),
        coalesce(sum("nv"), lit(0L)).cast("bigint").as("sum_nv"),
        sum((col("nv") <=> lit(null).cast("bigint")).cast("bigint"))
          .cast("bigint").as("n_nullsafe_null"))
      .orderBy(asc_nulls_first("nl"))

  // ---------------------------------------------------------------- q172

  /** DECIMAL money-math parity suite — exact fixed-point arithmetic in
    * the Spark ∩ DuckDB dialect intersection (the q127/q131/q142/q168
    * suite family, pointed at the type the warehouse's lat/long columns
    * already use, §1.3 DECIMAL(8,6)/(9,6)). The fixture's prices and
    * discounts sit on 2-decimal grids, so double→DECIMAL casts are
    * exact (no rounding divergence at the boundary), and the
    * net = price·(1−disc) product stays at scale 4 — EXACT, never
    * re-rounded. Division, avg, and scale-narrowing casts are
    * deliberately absent: decimal division result-scale rules differ
    * across engines, and a narrowing cast rounds HALF_UP in Spark but
    * half-to-even in DuckDB (measured here: casting this very product
    * to scale 2 diverged by ~95 cents over 24k rows) — documented
    * non-surfaces; the exact-arithmetic subset below is the portable
    * money dialect. SUMs over decimals are exact and order-free — the
    * money-safe alternative to double accumulation, at any scale. */
  def q172DecimalSuite(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("flag"),
        col("l_extendedprice").cast("decimal(18,2)").as("p"),
        col("l_discount").cast("decimal(4,2)").as("disc"))
      .withColumn("net",
        (col("p") * (lit(java.math.BigDecimal.ONE).cast("decimal(4,2)") -
          col("disc"))).cast("decimal(22,4)"))
      .groupBy("flag")
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum("p").cast("decimal(30,2)").cast("string").as("sum_price"),
        sum("net").cast("decimal(30,4)").cast("string").as("sum_net"),
        min("p").cast("decimal(18,2)").cast("string").as("min_price"),
        max("p").cast("decimal(18,2)").cast("string").as("max_price"),
        sum(col("p") + col("disc").cast("decimal(18,2)"))
          .cast("decimal(30,2)").cast("string").as("sum_mixed_scale"))
      .orderBy("flag")
  // decimal results surface as canonical fixed-scale STRINGS: wide
  // decimals lose their exact representation in the compare harness's
  // dataframe conversion (float64 coercion), while the string form
  // carries scale and value exactly in both engines

  // ---------------------------------------------------------------- q222

  /** q222 — CORRELATED SCALAR SUBQUERY parity: orders whose value beats
    * 1.5x their own customer's average order value — the classic
    * correlated-aggregate predicate, written AS a correlated subquery
    * on purpose (two of them: the per-customer count and the
    * per-customer cent sum) and left to Catalyst's
    * RewriteCorrelatedScalarSubquery to DECORRELATE into one
    * aggregate-plus-join. The surface verb the registry lacked: every
    * prior per-group-threshold query hand-writes the groupBy + join;
    * this one proves the declarative form plans to the same shape (the
    * plan has hash joins over ONE orders aggregate — PlanShapeSpec
    * pins no per-row subplan, no nested loop).
    *
    * The comparison stays on the exact integer lattice inside the
    * subquery predicate: 2 * cnt * cents > 3 * sum_cents avoids the
    * order-dependent float AVG entirely (1.5x as a 2/3 cross-multiply,
    * the q192 halves-cleared discipline).
    *
    * Scale: decorrelation turns the O(n^2)-looking per-row subquery
    * into one map-side-combinable customer aggregate joined back on
    * the scaling key — exactly what a hand-written plan would do. */
  /** q262 — correlated EXISTS / NOT EXISTS decorrelation parity: the
    * textbook predicate-subquery pair ("customers WITH a big order" /
    * "customers WITHOUT one"), written as literal correlated SQL so
    * Catalyst's RewritePredicateSubquery is what executes — the EXISTS
    * becomes a left-semi join and the NOT EXISTS a null-aware anti
    * join, the same plans q47's explicit semi/anti DataFrame forms
    * produce (this query pins the SQL-surface path; q47 pins the DSL
    * path). q222 covers the correlated SCALAR subquery; this closes
    * the predicate-subquery half of the decorrelation surface.
    *
    * Scale shape after rewrite: one equi-join on the scaling customer
    * key per branch, aggregated to the bounded segment enum — the
    * subquery never executes per-row. The threshold predicate pushes
    * into the orders scan on both branches. */
  def q262ExistsSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("graft_x_customer")
    Tables.orders(s, dir).createOrReplaceTempView("graft_x_orders")
    s.sql(
      """SELECT c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(CASE WHEN EXISTS (
        |      SELECT 1 FROM graft_x_orders o
        |      WHERE o.o_custkey = c.c_custkey
        |        AND o.o_totalprice > 200000) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_with_big_order,
        |  CAST(SUM(CASE WHEN NOT EXISTS (
        |      SELECT 1 FROM graft_x_orders o
        |      WHERE o.o_custkey = c.c_custkey) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_never_ordered
        |FROM graft_x_customer c
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }

  def q222CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_sq_orders")
    s.sql(
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM graft_sq_orders o
        |WHERE 2 * (SELECT COUNT(*) FROM graft_sq_orders o2
        |             WHERE o2.o_custkey = o.o_custkey)
        |      * CAST(round(o.o_totalprice * 100) AS BIGINT)
        |    > 3 * (SELECT SUM(CAST(round(o2.o_totalprice * 100) AS BIGINT))
        |             FROM graft_sq_orders o2
        |             WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q222_correlated_subquery" -> (q222CorrelatedSubquery _),
    "q262_exists_subquery" -> (q262ExistsSubquery _),
    "q168_null_semantics" -> (q168NullSemantics _),
    "q172_decimal_suite" -> (q172DecimalSuite _),
    "q117_sketch_overlap" -> (q117SketchOverlap _),
    "q118_cohort_retention" -> (q118CohortRetention _),
    "q119_event_transitions" -> (q119EventTransitions _),
    "q121_hopping_windows" -> (q121HoppingWindows _),
    "q122_sequence_assembly" -> (q122SequenceAssembly _),
    "q128_grouping_sets" -> (q128GroupingSets _),
    "q129_conditional_aggs" -> (q129ConditionalAggs _),
    "q130_map_suite" -> (q130MapSuite _),
    "q132_market_basket" -> (q132MarketBasket _),
    "q188_association_rules" -> (q188AssociationRules _),
    "q133_integrity_audit" -> (q133IntegrityAudit _),
    "q136_latest_wins" -> (q136LatestWins _),
    "q160_uniqueness_audit" -> (q160UniquenessAudit _),
    "q134_skew_profile" -> (q134SkewProfile _),
    "q249_join_cardinality" -> (q249JoinCardinality _),
    "q135_gap_detection" -> (q135GapDetection _),
    "q116_relative_rank" -> (q116RelativeRank _),
    "q114_cube" -> (q114Cube _),
    "q115_set_ops" -> (q115SetOps _),
    "q110_value_hour_corr" -> (q110ValueHourCorr _),
    "q103_funnel" -> (q103Funnel _),
    "q99_asof_join" -> (q99AsofJoin _),
    "q01_agg" -> (q01Agg _),
    "q02_topk_join" -> (q02TopkJoin _),
    "q03_date_filter_join" -> (q03DateFilterJoin _),
    "q04_multikey_left" -> (q04MultikeyLeft _),
    "q05_self_join" -> (q05SelfJoin _),
    "q06_role_playing" -> (q06RolePlaying _),
    "q07_four_key_calendar" -> (q07FourKeyCalendar _),
    "q08_window_movavg" -> (q08WindowMovavg _),
    "q09_argmin_window" -> (q09ArgminWindow _),
    "q10_contingency" -> (q10Contingency _),
    "q11_null_profile" -> (q11NullProfile _),
    "q12_minmax" -> (q12MinMax _),
    "q13_union" -> (q13Union _),
    "q14_distinct" -> (q14Distinct _),
    "q15_hour_histogram" -> (q15HourHistogram _),
    "q16_casts_keys" -> (q16CastsKeys _),
    "q17_timestamp_dim" -> (q17TimestampDim _),
    "q18_categories" -> (q18Categories _),
    "q19_dynamic_minmax" -> (q19DynamicMinMax _),
    "q20_view_star" -> (q20ViewStar _),
    "q38_two_phase_distinct" -> (q38TwoPhaseDistinct _),
    "q39_sessionize" -> (q39Sessionize _),
    "q43_rollup" -> (q43Rollup _),
    "q202_grouping_sets" -> (q202GroupingSets _),
    "q44_pivot" -> (q44Pivot _),
    "q45_approx_distinct" -> (q45ApproxDistinct _),
    "q46_window_suite" -> (q46WindowSuite _),
    "q47_semi_anti" -> (q47SemiAnti _),
    "q49_percentiles" -> (q49Percentiles _),
    "q51_approx_percentiles" -> (q51ApproxPercentiles _),
    "q56_asof_join" -> (q56AsofJoin _),
    "q57_range_join" -> (q57RangeJoin _),
    "q58_count_min" -> (q58CountMin _),
    "q59_bloom_membership" -> (q59BloomMembership _),
  )

  val oracles: Map[String, String] = Map(
    // the identical correlated form — DuckDB decorrelates it the same way
    "q262_exists_subquery" ->
      """SELECT c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(CASE WHEN EXISTS (
        |      SELECT 1 FROM orders o
        |      WHERE o.o_custkey = c.c_custkey
        |        AND o.o_totalprice > 200000) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_with_big_order,
        |  CAST(SUM(CASE WHEN NOT EXISTS (
        |      SELECT 1 FROM orders o
        |      WHERE o.o_custkey = c.c_custkey) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_never_ordered
        |FROM customer c
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q222_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM orders o
        |WHERE 2 * (SELECT COUNT(*) FROM orders o2
        |             WHERE o2.o_custkey = o.o_custkey)
        |      * CAST(round(o.o_totalprice * 100) AS BIGINT)
        |    > 3 * (SELECT SUM(CAST(round(o2.o_totalprice * 100) AS BIGINT))
        |             FROM orders o2
        |             WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q172_decimal_suite" ->
      """WITH x AS (SELECT l_returnflag AS flag,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
        |    CAST(l_discount AS DECIMAL(4,2)) AS disc
        |  FROM lineitem),
        |y AS (SELECT flag, p, disc,
        |    CAST(p * (CAST(1 AS DECIMAL(4,2)) - disc) AS DECIMAL(22,4)) AS net
        |  FROM x)
        |SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(p) AS DECIMAL(30,2)) AS VARCHAR) AS sum_price,
        |  CAST(CAST(SUM(net) AS DECIMAL(30,4)) AS VARCHAR) AS sum_net,
        |  CAST(CAST(MIN(p) AS DECIMAL(18,2)) AS VARCHAR) AS min_price,
        |  CAST(CAST(MAX(p) AS DECIMAL(18,2)) AS VARCHAR) AS max_price,
        |  CAST(CAST(SUM(p + CAST(disc AS DECIMAL(18,2))) AS DECIMAL(30,2))
        |    AS VARCHAR) AS sum_mixed_scale
        |FROM y GROUP BY flag ORDER BY flag""".stripMargin,
    "q168_null_semantics" ->
      """WITH x AS (SELECT nullif(l_returnflag, 'N') AS nl,
        |    CASE WHEN l_quantity > 40 THEN CAST(NULL AS BIGINT)
        |         ELSE CAST(l_quantity AS BIGINT) END AS nv
        |  FROM lineitem)
        |SELECT nl, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(nv) AS BIGINT) AS n_nv_nonnull,
        |  CAST(SUM(CASE WHEN nv IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nv_null,
        |  CAST(COUNT(DISTINCT nv) AS BIGINT) AS nd_nv,
        |  CAST(MIN(nv) AS BIGINT) AS min_nv,
        |  CAST(MAX(nv) AS BIGINT) AS max_nv,
        |  CAST(COALESCE(SUM(nv), 0) AS BIGINT) AS sum_nv,
        |  CAST(SUM(CAST(nv IS NOT DISTINCT FROM NULL AS INTEGER)) AS BIGINT)
        |    AS n_nullsafe_null
        |FROM x GROUP BY nl ORDER BY nl NULLS FIRST""".stripMargin,
    "q160_uniqueness_audit" -> Seq(
      ("customer", "customer", "c_custkey"),
      ("documents", "documents", "doc_id"),
      ("embeddings", "embeddings", "vec_id"),
      ("events", "events", "event_id"),
      ("lineitem", "lineitem", "(l_orderkey, l_linenumber)"),
      ("orders", "orders", "o_orderkey"),
      ("part", "part", "p_partkey"),
      ("supplier", "supplier", "s_suppkey"),
    ).map { case (name, tbl, key) =>
      val keyCols = key.stripPrefix("(").stripSuffix(")").replace(" ", "")
      s"""SELECT '$name' AS table_name, '$keyCols' AS key_cols,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(DISTINCT $key) AS BIGINT) AS n_distinct,
         |  COUNT(*) = COUNT(DISTINCT $key) AS is_unique
         |FROM $tbl""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name"),
    // replays the KMV selection exactly: per-type / per-pair k smallest
    // distinct hashes via row_number, kth value -> (k-1)*2^32 / h_k
    "q117_sketch_overlap" ->
      s"""WITH u AS (SELECT DISTINCT event_type AS t, user_id FROM events),
         |hd AS (SELECT DISTINCT t,
         |    ${duckMd5Int("concat('kmvu_', CAST(user_id AS VARCHAR))", 8)} AS h
         |  FROM u),
         |ty AS (SELECT DISTINCT t FROM u),
         |p AS (SELECT a.t AS ta, b.t AS tb FROM ty a JOIN ty b ON a.t < b.t),
         |r AS (SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rn FROM hd),
         |kk AS (SELECT t, max(h) AS h_k, COUNT(*) AS nk FROM r WHERE rn <= 32 GROUP BY t),
         |ud AS (SELECT DISTINCT p.ta, p.tb, hd.h FROM p JOIN hd ON hd.t = p.ta OR hd.t = p.tb),
         |ur AS (SELECT ta, tb, h, row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn FROM ud),
         |uk AS (SELECT ta, tb, max(h) AS h_k, COUNT(*) AS nk FROM ur WHERE rn <= 32 GROUP BY ta, tb),
         |ex AS (SELECT t, COUNT(*) AS n FROM u GROUP BY t),
         |eb AS (SELECT p.ta, p.tb, COUNT(*) AS n_both
         |  FROM p JOIN u a ON a.t = p.ta JOIN u b ON b.t = p.tb AND b.user_id = a.user_id
         |  GROUP BY p.ta, p.tb),
         |j AS (SELECT p.ta, p.tb, xa.n AS n_a, xb.n AS n_b,
         |    COALESCE(eb.n_both, 0) AS n_both,
         |    CASE WHEN ka.nk < 32 THEN CAST(ka.nk AS DOUBLE)
         |         ELSE (31.0 * 4294967296.0) / CAST(ka.h_k AS DOUBLE) END AS est_a,
         |    CASE WHEN kb.nk < 32 THEN CAST(kb.nk AS DOUBLE)
         |         ELSE (31.0 * 4294967296.0) / CAST(kb.h_k AS DOUBLE) END AS est_b,
         |    CASE WHEN uk.nk < 32 THEN CAST(uk.nk AS DOUBLE)
         |         ELSE (31.0 * 4294967296.0) / CAST(uk.h_k AS DOUBLE) END AS est_union
         |  FROM p JOIN ex xa ON xa.t = p.ta JOIN ex xb ON xb.t = p.tb
         |  JOIN kk ka ON ka.t = p.ta JOIN kk kb ON kb.t = p.tb
         |  JOIN uk ON uk.ta = p.ta AND uk.tb = p.tb
         |  LEFT JOIN eb ON eb.ta = p.ta AND eb.tb = p.tb)
         |SELECT ta, tb, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         |  CAST(n_both AS BIGINT) AS n_both,
         |  CAST(n_a + n_b - n_both AS BIGINT) AS n_union,
         |  est_a, est_b, est_union,
         |  est_a + est_b - est_union AS est_intersect,
         |  abs(est_union - CAST(n_a + n_b - n_both AS DOUBLE))
         |    / CAST(n_a + n_b - n_both AS DOUBLE) AS rel_err_union
         |FROM j ORDER BY ta, tb""".stripMargin,
    "q128_grouping_sets" ->
      """WITH e AS (SELECT event_type, CAST(hour(ts) // 6 AS INTEGER) AS hband FROM events)
        |SELECT coalesce(event_type, 'ALL') AS event_type,
        |  coalesce(hband, -1) AS hband,
        |  CAST(GROUPING(event_type) AS INTEGER) AS g_type,
        |  CAST(GROUPING(hband) AS INTEGER) AS g_band,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM e GROUP BY GROUPING SETS ((event_type), (hband), ())
        |ORDER BY event_type, hband""".stripMargin,
    "q136_latest_wins" ->
      """WITH e AS (SELECT user_id, event_type, value, event_id, ts,
        |    lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || ':' ||
        |      lpad(CAST(event_id AS VARCHAR), 20, '0') AS ord
        |  FROM events)
        |SELECT CAST(user_id AS BIGINT) AS user_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  arg_max(event_type, ord) AS last_type,
        |  arg_max(value, ord) AS last_value,
        |  CAST(arg_max(event_id, ord) AS BIGINT) AS last_event_id,
        |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q133_integrity_audit" ->
      """SELECT * FROM (
        |  SELECT 'lineitem->orders' AS relation, CAST((
        |    SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem) c
        |    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT) AS n_orphans
        |  UNION ALL
        |  SELECT 'orders->customer', CAST((
        |    SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders) c
        |    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'customer->nation', CAST((
        |    SELECT COUNT(*) FROM (SELECT DISTINCT c_nationkey FROM customer) c
        |    WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)) AS BIGINT)
        |) ORDER BY relation""".stripMargin,
    "q134_skew_profile" ->
      """WITH f AS (SELECT l_partkey, COUNT(*) AS f FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(f) AS BIGINT) AS total_rows,
        |  CAST(MAX(f) AS BIGINT) AS max_freq,
        |  quantile_cont(f, 0.5) AS p50_freq,
        |  quantile_cont(f, 0.99) AS p99_freq,
        |  CAST(MAX(f) AS DOUBLE) / CAST(SUM(f) AS DOUBLE) AS top1_share
        |FROM f""".stripMargin,
    "q249_join_cardinality" ->
      """WITH ca AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS ca
        |  FROM events GROUP BY user_id),
        |cb AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cb
        |  FROM orders GROUP BY o_custkey),
        |contrib AS (SELECT CAST(ca.k AS BIGINT) AS k, ca.ca, cb.cb,
        |    CAST(ca.ca * cb.cb AS BIGINT) AS pairs
        |  FROM ca JOIN cb USING (k)),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_join_keys,
        |    CAST(SUM(pairs) AS BIGINT) AS total_pairs,
        |    CAST(MAX(pairs) AS BIGINT) AS max_pairs FROM contrib),
        |top AS (SELECT 'key' AS row_kind, k, ca, cb, pairs,
        |    CAST((1000000 * pairs) // t.total_pairs AS BIGINT) AS share_e6
        |  FROM contrib CROSS JOIN t
        |  ORDER BY pairs DESC, k ASC LIMIT 5),
        |summary AS (SELECT 'total' AS row_kind, CAST(-1 AS BIGINT) AS k,
        |    n_join_keys AS ca, max_pairs AS cb, total_pairs AS pairs,
        |    CAST((1000000 * max_pairs) // total_pairs AS BIGINT) AS share_e6
        |  FROM t)
        |SELECT * FROM (SELECT * FROM summary UNION ALL SELECT * FROM top)
        |ORDER BY row_kind, pairs DESC, k ASC""".stripMargin,
    "q135_gap_detection" ->
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr
        |  FROM events),
        |g AS (SELECT event_type, hr FROM h GROUP BY event_type, hr),
        |d AS (SELECT event_type, hr,
        |    hr - lag(hr) OVER (PARTITION BY event_type ORDER BY hr) - 1 AS gap_before
        |  FROM g)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours_active,
        |  CAST(MIN(hr) AS BIGINT) AS first_hr, CAST(MAX(hr) AS BIGINT) AS last_hr,
        |  CAST(MAX(hr) - MIN(hr) + 1 AS BIGINT) AS span_hours,
        |  CAST(MAX(hr) - MIN(hr) + 1 - COUNT(*) AS BIGINT) AS n_gap_hours,
        |  CAST(COALESCE(MAX(gap_before), 0) AS BIGINT) AS max_gap_hours
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q132_market_basket" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |p AS (SELECT a.ok, a.pk AS part_a, b.pk AS part_b
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk)
        |SELECT CAST(part_a AS BIGINT) AS part_a,
        |  CAST(part_b AS BIGINT) AS part_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM p GROUP BY part_a, part_b
        |ORDER BY n_orders DESC, part_a, part_b LIMIT 20""".stripMargin,
    // identical pair frame (a < b, distinct baskets), both rule
    // directions, identical double chains inside the floors
    "q188_association_rules" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |nb AS (SELECT COUNT(DISTINCT ok) AS n FROM b),
        |items AS (SELECT pk, COUNT(*) AS n_item FROM b GROUP BY pk),
        |pairs AS (SELECT a.pk AS pa, b2.pk AS pb, COUNT(*) AS n_ab
        |  FROM b a JOIN b b2 ON a.ok = b2.ok AND a.pk < b2.pk
        |  GROUP BY a.pk, b2.pk HAVING COUNT(*) >= 2),
        |rules AS (SELECT pa AS ante, pb AS cons, n_ab FROM pairs
        |  UNION ALL SELECT pb, pa, n_ab FROM pairs)
        |SELECT CAST(r.ante AS BIGINT) AS antecedent,
        |  CAST(r.cons AS BIGINT) AS consequent,
        |  CAST(ia.n_item AS BIGINT) AS n_ante,
        |  CAST(ic.n_item AS BIGINT) AS n_cons,
        |  CAST(r.n_ab AS BIGINT) AS n_both,
        |  CAST(FLOOR(CAST(r.n_ab AS DOUBLE) / CAST(ia.n_item AS DOUBLE)
        |    * 1000000.0) AS BIGINT) AS conf_e6,
        |  CAST(FLOOR(CAST(r.n_ab AS DOUBLE) * CAST((SELECT n FROM nb) AS DOUBLE)
        |    / (CAST(ia.n_item AS DOUBLE) * CAST(ic.n_item AS DOUBLE))
        |    * 1000000.0) AS BIGINT) AS lift_e6
        |FROM rules r
        |JOIN items ia ON ia.pk = r.ante
        |JOIN items ic ON ic.pk = r.cons
        |ORDER BY n_both DESC, antecedent, consequent LIMIT 50""".stripMargin,
    "q130_map_suite" ->
      """WITH m AS (SELECT event_type,
        |    len(json_keys(props)) AS n_keys,
        |    array_to_string(list_sort(json_keys(props)), ',') AS key_set,
        |    COALESCE(CAST(props->>'k' AS INTEGER), 0) AS k_val
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_keys) AS BIGINT) AS sum_keys,
        |  CAST(COUNT(DISTINCT key_set) AS BIGINT) AS n_key_sets,
        |  MIN(key_set) AS min_key_set,
        |  CAST(SUM(k_val) AS BIGINT) AS sum_k
        |FROM m GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q129_conditional_aggs" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(count_if(value > 100.0) AS BIGINT) AS n_over_100,
        |  bool_and(value > 0.0) AS all_positive,
        |  bool_or(value > 300.0) AS any_over_300,
        |  arg_max(value, event_id) AS latest_value,
        |  arg_min(value, event_id) AS earliest_value,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q121_hopping_windows" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS t, value FROM events),
        |x AS (SELECT event_type, t, value, i
        |  FROM e CROSS JOIN (SELECT unnest([0, 1]) AS i))
        |SELECT event_type,
        |  (t // 10800000000 - i) * 10800000000 AS window_start_us,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY event_type, window_start_us
        |ORDER BY event_type, window_start_us""".stripMargin,
    "q122_sequence_assembly" ->
      """SELECT CAST(user_id AS BIGINT) AS user_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_t,
        |  CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_t,
        |  md5(string_agg(
        |    concat(epoch_us(ts), ':', event_id, ':', event_type), '|'
        |    ORDER BY epoch_us(ts), event_id)) AS seq_md5
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q118_cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT user_id, MIN(d) AS cohort FROM e GROUP BY user_id),
        |m AS (SELECT cohort, datediff('day', cohort, d) AS off,
        |    COUNT(DISTINCT e.user_id) AS n_users
        |  FROM e JOIN c ON e.user_id = c.user_id GROUP BY cohort, off),
        |w AS (SELECT cohort, off, n_users,
        |    MAX(CASE WHEN off = 0 THEN n_users END)
        |      OVER (PARTITION BY cohort) AS cohort_size
        |  FROM m)
        |SELECT CAST(cohort AS VARCHAR) AS cohort_day,
        |  CAST(off AS INTEGER) AS day_offset,
        |  CAST(n_users AS BIGINT) AS n_users,
        |  CAST(cohort_size AS BIGINT) AS cohort_size,
        |  CAST(n_users AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS retention
        |FROM w ORDER BY cohort_day, day_offset""".stripMargin,
    "q119_event_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |t AS (SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
        |  FROM s WHERE prev IS NOT NULL GROUP BY prev, event_type)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        |  CAST(n AS DOUBLE) /
        |    CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        |FROM t ORDER BY from_type, to_type""".stripMargin,
    "q116_relative_rank" ->
      """WITH r AS (SELECT event_type, event_id, value,
        |    percent_rank() OVER (PARTITION BY event_type ORDER BY value, event_id) AS pr,
        |    cume_dist() OVER (PARTITION BY event_type ORDER BY value, event_id) AS cd
        |  FROM events)
        |SELECT event_type, CAST(event_id AS BIGINT) AS event_id, value, pr, cd
        |FROM r WHERE pr >= 0.9 ORDER BY event_type, event_id""".stripMargin,
    "q114_cube" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |  coalesce(hband, -1) AS hband, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM (SELECT event_type, CAST(hour(ts) // 6 AS INTEGER) AS hband FROM events)
        |GROUP BY CUBE (event_type, hband)
        |ORDER BY event_type, hband""".stripMargin,
    "q115_set_ops" ->
      """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
        |p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        |tagged AS (
        |  SELECT 'click_and_purchase' AS relation, user_id
        |  FROM (SELECT user_id FROM c INTERSECT SELECT user_id FROM p)
        |  UNION ALL
        |  SELECT 'click_no_purchase', user_id
        |  FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM p))
        |SELECT relation, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(MIN(user_id) AS BIGINT) AS min_user,
        |  CAST(MAX(user_id) AS BIGINT) AS max_user
        |FROM tagged GROUP BY relation ORDER BY relation""".stripMargin,
    // exact integer moments (DuckDB sums BIGINT in 128 bits), then the
    // identical double assembly — corr() built-ins on either side would
    // be partition-order-dependent and engine-divergent. The x products
    // go through HUGEINT: a BIGINT x*x overflows at |x| > ~3.03e9, i.e.
    // |value| > ~3037 at the 1e6 quantization — fine on the fixture but
    // not a bound the operator should inherit (round-8 advice). The
    // Spark side's decimal(38,0) products hold to |value| < ~1e12.
    "q110_value_hour_corr" ->
      """WITH m AS (SELECT event_type,
        |    CAST(floor(value * 1e6) AS BIGINT) AS x,
        |    CAST(hour(ts) AS BIGINT) AS y
        |  FROM events),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(y * y) AS syy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM m GROUP BY event_type)
        |SELECT event_type, n,
        |  CAST(sx AS DOUBLE) / (1e6 * CAST(n AS DOUBLE)) AS mean_value,
        |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_hour,
        |  CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr
        |FROM g ORDER BY event_type""".stripMargin,
    "q103_funnel" ->
      """WITH w AS (SELECT user_id, ts, event_id, event_type,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rv
        |  FROM events),
        |c AS (SELECT user_id, ts, event_id, event_type, rv,
        |    CASE WHEN event_type = 'click' AND ts > rv THEN ts END AS cand_c
        |  FROM w),
        |c2 AS (SELECT user_id, ts, event_type, cand_c,
        |    MIN(cand_c) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rc
        |  FROM c),
        |u AS (SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS v_ts,
        |    MIN(cand_c) AS c_ts,
        |    MIN(CASE WHEN event_type = 'purchase' AND ts > rc THEN ts END) AS p_ts
        |  FROM c2 GROUP BY user_id),
        |s AS (SELECT COUNT(v_ts) AS n_v, COUNT(c_ts) AS n_c, COUNT(p_ts) AS n_p FROM u)
        |SELECT * FROM (
        |  SELECT CAST(1 AS INTEGER) AS stage_order, 'view' AS stage,
        |    CAST(n_v AS BIGINT) AS n_users, CAST(1.0 AS DOUBLE) AS conv_from_prev FROM s
        |  UNION ALL SELECT 2, 'view_click', CAST(n_c AS BIGINT),
        |    CAST(n_c AS DOUBLE) / CAST(n_v AS DOUBLE) FROM s
        |  UNION ALL SELECT 3, 'view_click_purchase', CAST(n_p AS BIGINT),
        |    CAST(n_p AS DOUBLE) / CAST(n_c AS DOUBLE) FROM s)
        |ORDER BY stage_order""".stripMargin,
    // q99: DuckDB's NATIVE ASOF JOIN — an independent implementation of
    // the same semantics (strictly-prior via `>`), so the hash gate
    // cross-checks the Spark union+window construction against a real
    // as-of operator rather than a mirrored re-derivation
    "q99_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT event_id, user_id, ts, event_type FROM events WHERE event_type <> 'purchase')
        |SELECT CAST(p.event_id AS BIGINT) AS event_id,
        |  CAST(p.user_id AS BIGINT) AS user_id,
        |  CAST(t.event_id AS BIGINT) AS touch_event_id,
        |  t.event_type AS touch_type,
        |  CAST(epoch_us(p.ts) - epoch_us(t.ts) AS BIGINT) AS micros_since_touch
        |FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND p.ts > t.ts
        |ORDER BY event_id""".stripMargin,
    // q59: 3-hex-digit strpos arithmetic = conv(substr(md5, 1, 3), 16, 10);
    // probes 0-9 exist in events, 99990-99999 do not, so the boolean
    // columns exercise hits, misses, and any deterministic false positives
    "q59_bloom_membership" ->
      """WITH hs AS (SELECT unnest(generate_series(0, 2)) AS h),
        |keys AS (SELECT DISTINCT user_id FROM events),
        |bloom AS (SELECT DISTINCT
        |    (((strpos('0123456789abcdef', substr(md5(concat(CAST(h AS VARCHAR), '#', CAST(user_id AS VARCHAR))), 1, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(md5(concat(CAST(h AS VARCHAR), '#', CAST(user_id AS VARCHAR))), 2, 1)) - 1)) * 16
        |      + (strpos('0123456789abcdef', substr(md5(concat(CAST(h AS VARCHAR), '#', CAST(user_id AS VARCHAR))), 3, 1)) - 1)) % 512 AS pos
        |  FROM keys, hs),
        |probes AS (SELECT unnest(generate_series(0, 9)) AS probe_id
        |  UNION ALL SELECT unnest(generate_series(99990, 99999))),
        |pbits AS (SELECT probe_id,
        |    (((strpos('0123456789abcdef', substr(md5(concat(CAST(h AS VARCHAR), '#', CAST(probe_id AS VARCHAR))), 1, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(md5(concat(CAST(h AS VARCHAR), '#', CAST(probe_id AS VARCHAR))), 2, 1)) - 1)) * 16
        |      + (strpos('0123456789abcdef', substr(md5(concat(CAST(h AS VARCHAR), '#', CAST(probe_id AS VARCHAR))), 3, 1)) - 1)) % 512 AS pos
        |  FROM probes, hs),
        |hits AS (SELECT probe_id, COUNT(*) AS n_bits FROM pbits
        |  WHERE EXISTS (SELECT 1 FROM bloom WHERE bloom.pos = pbits.pos) GROUP BY probe_id)
        |SELECT CAST(p.probe_id AS BIGINT) AS probe_id,
        |  COALESCE(n_bits, 0) = 3 AS bloom_hit,
        |  EXISTS (SELECT 1 FROM keys WHERE keys.user_id = p.probe_id) AS actually_present,
        |  (COALESCE(n_bits, 0) = 3 AND NOT EXISTS (SELECT 1 FROM keys WHERE keys.user_id = p.probe_id)) AS false_positive
        |FROM probes p LEFT JOIN hits ON p.probe_id = hits.probe_id
        |ORDER BY probe_id""".stripMargin,
    // q58: the sketch arithmetic is deterministic (md5-derived columns), so
    // the DuckDB twin rebuilds the identical 4x64 table and the ESTIMATES
    // hash-match — strpos-hex pair stands in for conv(hex, 16, 10)
    "q58_count_min" ->
      """WITH cells AS (SELECT user_id, r,
        |    ((strpos('0123456789abcdef', substr(md5(concat(CAST(r AS VARCHAR), ':', CAST(user_id AS VARCHAR))), 1, 1)) - 1) * 16
        |     + (strpos('0123456789abcdef', substr(md5(concat(CAST(r AS VARCHAR), ':', CAST(user_id AS VARCHAR))), 2, 1)) - 1)) % 64 AS c
        |  FROM events, (SELECT unnest(generate_series(0, 3)) AS r)),
        |cms AS (SELECT r, c, COUNT(*) AS cnt FROM cells GROUP BY r, c),
        |probes AS (SELECT DISTINCT user_id, r,
        |    ((strpos('0123456789abcdef', substr(md5(concat(CAST(r AS VARCHAR), ':', CAST(user_id AS VARCHAR))), 1, 1)) - 1) * 16
        |     + (strpos('0123456789abcdef', substr(md5(concat(CAST(r AS VARCHAR), ':', CAST(user_id AS VARCHAR))), 2, 1)) - 1)) % 64 AS c
        |  FROM events, (SELECT unnest(generate_series(0, 3)) AS r) WHERE user_id < 10),
        |est AS (SELECT p.user_id, MIN(cms.cnt) AS cms_n
        |  FROM cms JOIN probes p ON cms.r = p.r AND cms.c = p.c GROUP BY p.user_id),
        |exact AS (SELECT user_id, COUNT(*) AS exact_n FROM events WHERE user_id < 10 GROUP BY user_id)
        |SELECT CAST(x.user_id AS BIGINT) AS user_id, CAST(exact_n AS BIGINT) AS exact_n,
        |  CAST(cms_n AS BIGINT) AS cms_n, CAST(cms_n - exact_n AS BIGINT) AS overcount
        |FROM exact x JOIN est ON x.user_id = est.user_id ORDER BY user_id""".stripMargin,
    // q57: same gaps-and-islands CTEs as q39, then second-truncated bounds
    // and a BETWEEN containment join (DuckDB plans it as an IEJoin; the
    // Spark side buckets to hours + equi-join, same result)
    "q57_range_join" ->
      """WITH g AS (SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |  FROM events),
        |f AS (SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM g),
        |sess AS (SELECT user_id, ts,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS INTEGER) AS session_idx
        |  FROM f),
        |b AS (SELECT user_id, session_idx,
        |    date_trunc('second', MIN(ts)) AS st, date_trunc('second', MAX(ts)) AS en
        |  FROM sess GROUP BY user_id, session_idx)
        |SELECT CAST(b.user_id AS BIGINT) AS user_id, b.session_idx,
        |  CAST(COUNT(*) AS BIGINT) AS n_in_range
        |FROM b JOIN events e ON e.user_id = b.user_id AND e.ts BETWEEN b.st AND b.en
        |GROUP BY b.user_id, b.session_idx ORDER BY user_id, session_idx""".stripMargin,
    "q56_asof_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts FROM events
        |  WHERE event_type IN ('click', 'error')),
        |w AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
        |  FROM e)
        |SELECT CAST(user_id AS BIGINT) AS user_id, CAST(event_id AS BIGINT) AS event_id,
        |  CAST(COALESCE(us - last_click, -1) AS BIGINT) AS us_since_click
        |FROM w WHERE event_type = 'error' ORDER BY user_id, event_id""".stripMargin,
    // q45's sketch estimate never appears in the output — only the exact
    // count and the bounded-error boolean, both deterministic, so the HLL
    // query IS oracle-checkable despite engines disagreeing on estimates
    "q45_approx_distinct" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(COUNT(*) AS BIGINT) AS n_events, true AS sketch_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q49_percentiles" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.25) AS p25,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.95) AS p95,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q51's sketch values never appear in the output — exact percentiles
    // plus a rank-envelope boolean that GK's error guarantee makes
    // deterministically true (see q51ApproxPercentiles doc)
    "q51_approx_percentiles" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.25) AS p25,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.95) AS p95,
        |  true AS sketch_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q46_window_suite" ->
      """WITH e AS (SELECT * FROM events WHERE user_id < 20)
        |SELECT user_id, event_id,
        |  COALESCE(lag(value, 1) OVER w, -1.0) AS prev_value,
        |  COALESCE(lead(value, 1) OVER w, -1.0) AS next_value,
        |  CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS INTEGER) AS value_rank,
        |  CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS INTEGER) AS type_rank,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_sum
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id, event_id""".stripMargin,
    "q47_semi_anti" ->
      """WITH big AS (SELECT l_orderkey FROM lineitem WHERE l_extendedprice > 4000),
        |w1 AS (SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_with FROM orders
        |  WHERE EXISTS (SELECT 1 FROM big WHERE l_orderkey = o_orderkey) GROUP BY 1),
        |w2 AS (SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_without FROM orders
        |  WHERE NOT EXISTS (SELECT 1 FROM big WHERE l_orderkey = o_orderkey) GROUP BY 1)
        |SELECT COALESCE(w1.o_orderstatus, w2.o_orderstatus) AS o_orderstatus,
        |  COALESCE(n_with, 0) AS n_with, COALESCE(n_without, 0) AS n_without
        |FROM w1 FULL OUTER JOIN w2 ON w1.o_orderstatus = w2.o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q43_rollup" ->
      """SELECT COALESCE(event_type, '<all>') AS event_type,
        |  COALESCE(CAST(hour(ts) AS INTEGER), -1) AS hr,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY ROLLUP(event_type, CAST(hour(ts) AS INTEGER))
        |ORDER BY event_type, hr""".stripMargin,
    // identical sets and the identical assembled grouping id
    // (2·grouping(region) + grouping(segment) — both engines ship
    // grouping(); their grouping_id() conventions differ)
    "q202_grouping_sets" ->
      """SELECT COALESCE(r_name, '<all>') AS region,
        |  COALESCE(c_mktsegment, '<all>') AS segment,
        |  CAST(2 * GROUPING(r_name) + GROUPING(c_mktsegment) AS INTEGER)
        |    AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS rev_cents
        |FROM orders o
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey
        |GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name),
        |  (c_mktsegment), ())
        |ORDER BY gid, region, segment""".stripMargin,
    "q44_pivot" ->
      """SELECT CAST(ts AS DATE) AS d,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup
        |FROM events GROUP BY 1 ORDER BY d""".stripMargin,
    "q39_sessionize" ->
      """WITH g AS (SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |  FROM events),
        |f AS (SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM g),
        |sess AS (SELECT user_id, ts,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS INTEGER) AS session_idx
        |  FROM f)
        |SELECT user_id, session_idx,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM sess GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "q38_two_phase_distinct" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_topk_join" ->
      """SELECT COALESCE(p_brand, '?') AS brand, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY cnt DESC, brand ASC LIMIT 10""".stripMargin,
    "q03_date_filter_join" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q04_multikey_left" ->
      """WITH c AS (SELECT user_id, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS click_n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS click_sum
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |v AS (SELECT user_id, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS view_n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS view_sum
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT user_id, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS purch_n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS purch_sum
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id, c.d, c.click_n, c.click_sum,
        |  COALESCE(v.view_n, 0) AS view_n, COALESCE(v.view_sum, 0.0) AS view_sum,
        |  COALESCE(p.purch_n, 0) AS purch_n, COALESCE(p.purch_sum, 0.0) AS purch_sum
        |FROM c LEFT JOIN v ON c.user_id = v.user_id AND c.d = v.d
        |       LEFT JOIN p ON c.user_id = p.user_id AND c.d = p.d
        |ORDER BY c.user_id, c.d""".stripMargin,
    "q05_self_join" ->
      """SELECT l1.l_orderkey, l1.l_quantity AS qty1, l1.l_extendedprice AS price1,
        |  COALESCE(l2.l_quantity, -1.0) AS qty2
        |FROM (SELECT * FROM lineitem WHERE l_linenumber = 1) l1
        |LEFT JOIN (SELECT * FROM lineitem WHERE l_linenumber = 2) l2
        |  ON l1.l_orderkey = l2.l_orderkey
        |ORDER BY l1.l_orderkey, qty1, price1, qty2""".stripMargin,
    "q06_role_playing" ->
      """SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q07_four_key_calendar" ->
      """WITH daily AS (
        |  SELECT CAST(year(ts) AS INTEGER) AS y, CAST(month(ts) AS INTEGER) AS m,
        |    CAST(dayofmonth(ts) AS INTEGER) AS dom, user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS daily_avg
        |  FROM events GROUP BY 1, 2, 3, 4)
        |SELECT e.event_id, CAST(year(e.ts) AS INTEGER) AS y, CAST(month(e.ts) AS INTEGER) AS m,
        |  CAST(dayofmonth(e.ts) AS INTEGER) AS dom, e.user_id, e.value,
        |  COALESCE(d.daily_avg, 0.0) AS daily_avg
        |FROM events e LEFT JOIN daily d
        |  ON year(e.ts) = d.y AND month(e.ts) = d.m AND dayofmonth(e.ts) = d.dom
        |  AND e.user_id = d.user_id
        |ORDER BY e.event_id""".stripMargin,
    "q08_window_movavg" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS d,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dayint
        |  FROM orders GROUP BY 1, 2)
        |SELECT prio, d, CAST(rev_dec AS DOUBLE) AS day_rev,
        |  CAST(SUM(rev_dec) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE) AS mov_avg
        |FROM daily
        |WINDOW w AS (PARTITION BY prio ORDER BY dayint RANGE BETWEEN 7 PRECEDING AND CURRENT ROW)
        |ORDER BY prio, d""".stripMargin,
    "q09_argmin_window" ->
      """SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q10_contingency" ->
      """SELECT value > 50 AS is_high, event_type = 'error' AS is_error,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q11_null_profile" ->
      """SELECT CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS nulls_o_orderkey,
        |  CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS nulls_o_custkey,
        |  CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT) AS nulls_o_orderstatus,
        |  CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT) AS nulls_o_totalprice,
        |  CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT) AS nulls_o_orderdate,
        |  CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT) AS nulls_o_orderpriority
        |FROM orders""".stripMargin,
    "q12_minmax" ->
      """SELECT CAST(MIN(o_orderdate) AS DATE) AS min_date,
        |  CAST(MAX(o_orderdate) AS DATE) AS max_date,
        |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders""".stripMargin,
    "q13_union" ->
      """WITH u AS (
        |  SELECT event_type, value FROM events WHERE event_type IN ('click', 'view')
        |  UNION ALL
        |  SELECT event_type, value FROM events WHERE event_type = 'purchase')
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM u GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q14_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    "q15_hour_histogram" ->
      """SELECT CAST(hour(ts) AS INTEGER) AS hr, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events GROUP BY 1 ORDER BY hr""".stripMargin,
    "q16_casts_keys" ->
      """SELECT c_custkey,
        |  concat_ws('_', CAST(c_custkey AS VARCHAR), CAST(c_nationkey AS VARCHAR)) AS cust_nation_key,
        |  CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal_dec,
        |  concat(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR), ',', c_mktsegment) AS bal_seg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q17_timestamp_dim" ->
      """SELECT CAST(epoch(ts) AS INTEGER) AS id,
        |  CAST(year(ts) AS INTEGER) AS year, CAST(month(ts) AS INTEGER) AS month,
        |  CAST(dayofmonth(ts) AS INTEGER) AS dayofmonth,
        |  CAST(weekofyear(ts) AS INTEGER) AS weekofyear,
        |  CAST(hour(ts) AS INTEGER) AS hour, CAST(minute(ts) AS INTEGER) AS minute
        |FROM generate_series(TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-31 23:59:00', INTERVAL 1 MINUTE) t(ts)
        |ORDER BY id""".stripMargin,
    "q18_categories" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d,
        |    CASE WHEN CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) > 60 THEN 'high'
        |         WHEN CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) > 40 THEN 'mid'
        |         ELSE 'low' END AS category,
        |    COUNT(*) > 3 AS is_active
        |  FROM events GROUP BY 1, 2)
        |SELECT d.category, d.is_active, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM events e JOIN daily d ON e.user_id = d.user_id AND CAST(e.ts AS DATE) = d.d
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q19_dynamic_minmax" ->
      """SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS minutes
        |FROM generate_series(TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-31 23:59:00', INTERVAL 1 MINUTE) t(ts)
        |WHERE ts >= (SELECT MIN(ts) FROM events) AND ts <= (SELECT MAX(ts) FROM events)
        |GROUP BY 1 ORDER BY d""".stripMargin,
    "q20_view_star" ->
      """SELECT l_orderkey, l_linenumber, CAST(o_orderdate AS DATE) AS order_date,
        |  c_name, n1.n_name AS cust_nation, n2.n_name AS supp_nation, p_name,
        |  l_extendedprice * (1 - l_discount) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
  )
}
