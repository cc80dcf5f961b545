package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** General relational operator coverage (SURVEY.md §2.5-2.9) exercised
  * over the driver-provided TPC-H-ish tables: hash aggregation,
  * broadcast join chains, semi/anti joins, window top-k, rollup,
  * time-bucketed aggregation, set ops, filter/projection pushdown.
  *
  * Determinism rules for oracle parity — NO DECIMAL anywhere (round-2
  * fix): a DECIMAL output stringifies with trailing zeros under a
  * pyarrow-style reader ("420129.40") but without them under a float
  * reader ("420129.4"), so the driver's value hash diverges even when
  * the values are identical. Instead every money aggregate is computed
  * in integer cents — `floor(x*100 + 0.5)` is a pure IEEE-754 op
  * sequence that yields bit-identical BIGINTs in Spark and DuckDB, the
  * sum is exact and order-independent (accumulated in DECIMAL(38,0),
  * matching DuckDB's HUGEINT accumulator — see [[sumCents]]), and the
  * final division by 100.0 is one IEEE op producing the same double
  * bits on both engines.
  * Per-row money values (window output, max) pass through as the raw
  * DOUBLE read from parquet — trivially bit-equal. Every window ordering
  * carries a unique tiebreak key.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Integer cents: exact cross-engine quantization of a 2-decimal money
    * double (DuckDB mirror: floor(x*100 + 0.5)::BIGINT).
    */
  private def cents(c: Column): Column = floor(c * lit(100) + lit(0.5))

  /** Overflow-safe sum of an integer-cents term: accumulate in
    * DECIMAL(38,0) — 38 digits vs BIGINT's 9.2e18 ceiling — mirroring
    * DuckDB, whose sum(BIGINT) is already HUGEINT (int128). A LONG sum
    * would silently wrap at ~9e9 rows of 1e9-magnitude terms, i.e.
    * within the 10^12-row design scale (round-2 ADVICE, low). The
    * accumulator stays internal: outputs cast to DOUBLE, so the
    * reader-dependent DECIMAL stringification hash pitfall is never
    * exposed, and both engines convert their exact integer sum to
    * double with the same IEEE round-to-nearest.
    */
  private def sumCents(term: Column): Column = sum(term.cast("decimal(38,0)"))

  /** cents-sum -> money double: one IEEE division, bit-equal on both
    * engines (DuckDB mirror: sum(...)::DOUBLE / 100.0).
    */
  private def money(sumCents: Column): Column = sumCents.cast("double") / lit(100.0)

  /** TPC-H Q1 flavor: scan-heavy partial+final hash agg. */
  def aggPricing(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(sumCents(cents(col("l_quantity")))).as("sum_qty"),
        money(sumCents(cents(col("l_extendedprice")))).as("sum_base_price"),
        // discounted price in cents*100 units (scale 4): exact BIGINT
        // per-row product, exact sum, one final division
        (sumCents(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .cast("double") / lit(10000.0)).as("sum_disc_price"),
        (money(sumCents(cents(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** Broadcast-join chain: orders -> customer -> nation -> region.
    * Dims are tiny: forced broadcast keeps the fact side shuffle-free.
    */
  def joinRevenueByNation(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        money(sumCents(cents(col("o_totalprice")))).as("revenue"),
        count(lit(1)).as("n_orders"))

  /** Window top-k: top-3 orders per customer by totalprice (unique
    * tiebreak on orderkey for determinism). totalprice passes through as
    * the raw parquet DOUBLE — bit-equal on both engines by construction.
    */
  def windowTop3Orders(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice").as("totalprice"), col("rk"))
  }

  /** Semi/anti join: one-row summary of customers with/without orders. */
  def semiAntiCustomers(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
    val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
    val without = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
    withOrders.agg(count(lit(1)).as("with_orders"))
      .crossJoin(without.agg(count(lit(1)).as("without_orders")))
  }

  /** Rollup aggregation over orders status x priority. */
  def rollupOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        money(sumCents(cents(col("o_totalprice")))).as("total"))

  /** Time-bucketed aggregation over the events stream table. */
  def eventsHourly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        money(sumCents(cents(col("value")))).as("sum_value"))

  /** Set ops: event types never appearing as high-value events. */
  def setOpsEventTypes(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.select(col("event_type")).distinct()
      .except(e.filter(col("value") > 360).select(col("event_type")).distinct())
  }

  /** Filter + projection pushdown: selective scan (verified in spec:
    * PushedFilters + pruned ReadSchema reach the parquet scan).
    */
  def pushdownScan(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") >= 45 && col("l_discount") <= lit(0.02))
      .agg(count(lit(1)).as("n"),
        money(sumCents(cents(col("l_extendedprice")))).as("price_sum"))

  /** Grouped distinct-count + conditional aggregation over part.
    * max_price is the raw parquet DOUBLE (max never mixes values).
    */
  def partBrandStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .groupBy(col("p_brand"))
      .agg(
        countDistinct(col("p_type")).as("n_types"),
        sum(when(col("p_size") >= 25, 1L).otherwise(0L)).as("n_large"),
        max(col("p_retailprice")).as("max_price"))

  /** SESSIONIZATION: gap-based sessions over the event stream (new
    * session when a user is idle > 30 min) via the lag + cumulative-sum
    * window idiom, then one session-level rollup. Timestamps compare as
    * exact epoch MICROS (integer in both engines). Scale shape: both
    * windows partition on user_id — fine-grained keys; at 100 TB the
    * input would be range-partitioned (user, day) so each partition
    * sorts locally, which is exactly what the window asks Catalyst for.
    * (event_id tiebreak makes the ordering total.)
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val e = t(s, dir, "events")
      // ts is TIMESTAMP_NTZ; the session timezone is pinned UTC, so the
      // cast reads the naive value as UTC — same micros DuckDB's
      // epoch_us(ts) yields on the naive timestamp directly
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    val gapped = e.withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        (col("prev_us").isNull || col("ts_us") - col("prev_us") > 30L * 60 * 1000000)
          .cast("long"))
    val sess = gapped.withColumn("session_idx", sum(col("is_new")).over(byUser))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("dur_us"))
    sess.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_sessions"),
      sum(col("n_events")).as("n_events"),
      max(col("n_events")).as("max_session_events"),
      max(col("dur_us")).as("max_session_dur_us"),
      min(col("start_us")).as("first_seen_us"))
  }

  /** Semi-structured JSON props: per-type extraction stats over the
    * events table's JSON column (get_json_object path extraction — the
    * coverage row for JSON functions). All-integer outputs.
    */
  def propsJson(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(col("k").isNull.cast("long")).as("n_null"))

  /** PIVOT (wide aggregation): order counts + money by priority,
    * pivoted on status — Spark's .pivot() with the value set pinned
    * (unpinned pivot scans twice to discover values; never at scale).
    * The DuckDB oracle is the equivalent conditional aggregation,
    * which is also exactly the physical plan Spark lowers pivot to —
    * one pass, no extra shuffle beyond the groupBy.
    */
  def pivotStatus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pivot_status" -> (pivotStatus _),
    "q_sessionize" -> (sessionize _),
    "q_props_json" -> (propsJson _),
    "q_agg_pricing" -> (aggPricing _),
    "q_join_revenue_nation" -> (joinRevenueByNation _),
    "q_window_top3" -> (windowTop3Orders _),
    "q_semi_anti" -> (semiAntiCustomers _),
    "q_rollup_orders" -> (rollupOrders _),
    "q_events_hourly" -> (eventsHourly _),
    "q_setops_events" -> (setOpsEventTypes _),
    "q_pushdown_scan" -> (pushdownScan _),
    "q_part_brand_stats" -> (partBrandStats _)
  )

  // DuckDB fragments mirroring cents()/money() bit-for-bit:
  private def C(e: String) = s"floor($e*100 + 0.5)::BIGINT"
  private def M(e: String) = s"(sum($e)::DOUBLE / 100.0)"

  val oracles: Map[String, String] = Map(
    "q_pivot_status" ->
      """SELECT o_orderpriority,
         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_f,
         sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_o,
         sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_p
         FROM orders GROUP BY o_orderpriority""".replaceAll("\\s+", " "),

    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
         g AS (SELECT user_id, event_id, ts_us,
             lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us
           FROM e),
         m AS (SELECT user_id, event_id, ts_us,
             CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM g),
         x AS (SELECT user_id, ts_us,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS session_idx
           FROM m),
         sess AS (SELECT user_id, session_idx, count(*)::BIGINT AS n_events,
             min(ts_us) AS start_us, (max(ts_us) - min(ts_us))::BIGINT AS dur_us
           FROM x GROUP BY user_id, session_idx)
         SELECT user_id, count(*)::BIGINT AS n_sessions, sum(n_events)::BIGINT AS n_events,
           max(n_events)::BIGINT AS max_session_events,
           max(dur_us)::BIGINT AS max_session_dur_us,
           min(start_us)::BIGINT AS first_seen_us
         FROM sess GROUP BY user_id""".replaceAll("\\s+", " "),

    "q_props_json" ->
      """SELECT event_type, count(*)::BIGINT AS n,
         sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
         min(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS min_k,
         max(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS max_k,
         sum(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null
         FROM events GROUP BY event_type""".replaceAll("\\s+", " "),

    "q_agg_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${M(C("l_quantity"))} AS sum_qty,
         ${M(C("l_extendedprice"))} AS sum_base_price,
         (sum(${C("l_extendedprice")} * (100 - ${C("l_discount")}))::DOUBLE / 10000.0) AS sum_disc_price,
         (${M(C("l_quantity"))} / count(*)) AS avg_qty,
         count(*)::BIGINT AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""".replaceAll("\\s+", " "),

    "q_join_revenue_nation" ->
      s"""SELECT r_name, n_name,
         ${M(C("o_totalprice"))} AS revenue,
         count(*)::BIGINT AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""".replaceAll("\\s+", " "),

    "q_window_top3" ->
      """SELECT o_custkey, o_orderkey, o_totalprice AS totalprice, rk FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
         FROM orders) WHERE rk <= 3""".replaceAll("\\s+", " "),

    "q_semi_anti" ->
      // EXISTS / NOT EXISTS, not IN / NOT IN: left_anti keeps every
      // unmatched row even when the probe side contains NULL keys,
      // while NOT IN returns ZERO rows on any NULL — the oracle must
      // mirror the engine's null semantics, not SQL's three-valued IN
      // (round-4 review; latent until the generator emits NULL keys)
      """SELECT
         (SELECT count(*) FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))::BIGINT AS with_orders,
         (SELECT count(*) FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))::BIGINT AS without_orders""".replaceAll("\\s+", " "),

    "q_rollup_orders" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS n,
         ${M(C("o_totalprice"))} AS total
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".replaceAll("\\s+", " "),

    "q_events_hourly" ->
      s"""SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
         count(*)::BIGINT AS n, ${M(C("value"))} AS sum_value
         FROM events GROUP BY 1, 2""".replaceAll("\\s+", " "),

    "q_setops_events" ->
      """SELECT DISTINCT event_type FROM events
         EXCEPT
         SELECT DISTINCT event_type FROM events WHERE value > 360""".replaceAll("\\s+", " "),

    "q_pushdown_scan" ->
      s"""SELECT count(*)::BIGINT AS n,
         ${M(C("l_extendedprice"))} AS price_sum
         FROM lineitem WHERE l_quantity >= 45 AND l_discount <= 0.02""".replaceAll("\\s+", " "),

    "q_part_brand_stats" ->
      """SELECT p_brand, count(DISTINCT p_type)::BIGINT AS n_types,
         sum(CASE WHEN p_size >= 25 THEN 1 ELSE 0 END)::BIGINT AS n_large,
         max(p_retailprice) AS max_price
         FROM part GROUP BY p_brand""".replaceAll("\\s+", " ")
  )
}
