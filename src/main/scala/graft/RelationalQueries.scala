package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** General relational operator coverage (SURVEY.md §2.5-2.9) exercised
  * over the driver-provided TPC-H-ish tables: hash aggregation,
  * broadcast join chains, semi/anti joins, window top-k, rollup,
  * time-bucketed aggregation, set ops, filter/projection pushdown.
  *
  * Determinism rules for oracle parity: money aggregates use explicit
  * DECIMAL casts (exact, order-independent); averages are computed as
  * round(double(sum)/count, 6); every window ordering carries a unique
  * tiebreak key.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** TPC-H Q1 flavor: scan-heavy partial+final hash agg. */
  def aggPricing(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("decimal(38,2)").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("decimal(38,2)").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("decimal(38,4)").as("sum_disc_price"),
        round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 6).as("avg_qty"),
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
        sum(dec(col("o_totalprice"))).cast("decimal(38,2)").as("revenue"),
        count(lit(1)).as("n_orders"))

  /** Window top-k: top-3 orders per customer by totalprice (unique
    * tiebreak on orderkey for determinism).
    */
  def windowTop3Orders(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        dec(col("o_totalprice")).as("totalprice"), col("rk"))
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
        sum(dec(col("o_totalprice"))).cast("decimal(38,2)").as("total"))

  /** Time-bucketed aggregation over the events stream table. */
  def eventsHourly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("decimal(38,2)").as("sum_value"))

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
        sum(dec(col("l_extendedprice"))).cast("decimal(38,2)").as("price_sum"))

  /** Grouped distinct-count + conditional aggregation over part. */
  def partBrandStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .groupBy(col("p_brand"))
      .agg(
        countDistinct(col("p_type")).as("n_types"),
        sum(when(col("p_size") >= 25, 1L).otherwise(0L)).as("n_large"),
        max(dec(col("p_retailprice"))).as("max_price"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

  val oracles: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity::DECIMAL(18,2))::DECIMAL(38,2) AS sum_qty,
         sum(l_extendedprice::DECIMAL(18,2))::DECIMAL(38,2) AS sum_base_price,
         sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DECIMAL(38,4) AS sum_disc_price,
         round(sum(l_quantity::DECIMAL(18,2))::DOUBLE / count(*), 6) AS avg_qty,
         count(*)::BIGINT AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""".replaceAll("\\s+", " "),

    "q_join_revenue_nation" ->
      """SELECT r_name, n_name,
         sum(o_totalprice::DECIMAL(18,2))::DECIMAL(38,2) AS revenue,
         count(*)::BIGINT AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""".replaceAll("\\s+", " "),

    "q_window_top3" ->
      """SELECT o_custkey, o_orderkey, o_totalprice::DECIMAL(18,2) AS totalprice, rk FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
         FROM orders) WHERE rk <= 3""".replaceAll("\\s+", " "),

    "q_semi_anti" ->
      """SELECT
         (SELECT count(*) FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders))::BIGINT AS with_orders,
         (SELECT count(*) FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))::BIGINT AS without_orders""".replaceAll("\\s+", " "),

    "q_rollup_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS n,
         sum(o_totalprice::DECIMAL(18,2))::DECIMAL(38,2) AS total
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".replaceAll("\\s+", " "),

    "q_events_hourly" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
         count(*)::BIGINT AS n, sum(value::DECIMAL(18,2))::DECIMAL(38,2) AS sum_value
         FROM events GROUP BY 1, 2""".replaceAll("\\s+", " "),

    "q_setops_events" ->
      """SELECT DISTINCT event_type FROM events
         EXCEPT
         SELECT DISTINCT event_type FROM events WHERE value > 360""".replaceAll("\\s+", " "),

    "q_pushdown_scan" ->
      """SELECT count(*)::BIGINT AS n,
         sum(l_extendedprice::DECIMAL(18,2))::DECIMAL(38,2) AS price_sum
         FROM lineitem WHERE l_quantity >= 45 AND l_discount <= 0.02""".replaceAll("\\s+", " "),

    "q_part_brand_stats" ->
      """SELECT p_brand, count(DISTINCT p_type)::BIGINT AS n_types,
         sum(CASE WHEN p_size >= 25 THEN 1 ELSE 0 END)::BIGINT AS n_large,
         max(p_retailprice::DECIMAL(18,2)) AS max_price
         FROM part GROUP BY p_brand""".replaceAll("\\s+", " ")
  )
}
