package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GQuery
import graft.GQuery.oracled
import graft.sources.Tables
import graft.functions.GraftFunctions._

/** Multi-dimensional aggregation + time-windowed aggregation
  * (SURVEY.md §2.2 "grouping sets / cube / rollup" and "Streaming" —
  * the batch `window()`/`session_window` twins here are the oracle-
  * testable forms of the Structured Streaming pipeline in
  * graft.streaming). Group keys are coalesced to a sentinel so no NULL
  * ever reaches an ORDER BY (Spark sorts nulls first, DuckDB last).
  */
object Olap {

  private val All = "(all)"

  /** q25 — ROLLUP over the region→nation hierarchy. One Expand + one
    * hash aggregate: the per-grouping duplication happens map-side and
    * partial-aggregates before the shuffle, so the rollup costs the same
    * single shuffle at 100 TB as the flat aggregate.
    */
  val q25 = oracled(
    "q25_rollup",
    "ROLLUP hierarchy totals with grouping_id",
    """SELECT COALESCE(r_name, '(all)') AS region,
       COALESCE(n_name, '(all)') AS nation,
       CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY ROLLUP(r_name, n_name)
       ORDER BY gid, region, nation""") { (s, dir) =>
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_customers"),
        sum(dec2(col("c_acctbal"))).cast("double").as("total_bal"))
      .select(
        coalesce(col("r_name"), lit(All)).as("region"),
        coalesce(col("n_name"), lit(All)).as("nation"),
        col("gid"), col("n_customers"), col("total_bal"))
      .orderBy(col("gid"), col("region"), col("nation"))
  }

  /** q26 — CUBE over two independent dimensions (all 4 grouping sets). */
  val q26 = oracled(
    "q26_cube",
    "CUBE over returnflag × linestatus",
    """SELECT COALESCE(l_returnflag, '(all)') AS rf,
       COALESCE(l_linestatus, '(all)') AS ls,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
       FROM lineitem
       GROUP BY CUBE(l_returnflag, l_linestatus)
       ORDER BY gid, rf, ls""") { (s, dir) =>
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n"),
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit(All)).as("rf"),
        coalesce(col("l_linestatus"), lit(All)).as("ls"),
        col("gid"), col("n"), col("sum_qty"))
      .orderBy(col("gid"), col("rf"), col("ls"))
  }

  /** q27 — explicit GROUPING SETS: per-status and per-priority margins
    * only (no cross product, no detail rows).
    */
  val q27 = oracled(
    "q27_grouping_sets",
    "GROUPING SETS ((a),(b)) — independent margins in one pass",
    """SELECT COALESCE(o_orderstatus, '(all)') AS status,
       COALESCE(o_orderpriority, '(all)') AS priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
       ORDER BY status, priority""") { (s, dir) =>
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit(All)).as("status"),
        coalesce(col("o_orderpriority"), lit(All)).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))
  }

  /** q28 — tumbling time window over the events table: the batch twin of
    * the streaming aggregation (graft.streaming.EventsStreaming). Epoch-
    * aligned 6-hour buckets, emitted as formatted strings for oracle
    * parity.
    */
  val q28 = oracled(
    "q28_time_window_tumbling",
    "6-hour tumbling window aggregation over event time",
    """SELECT strftime(CAST(to_timestamp(floor(epoch(ts) / 21600) * 21600) AS TIMESTAMP),
                       '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM events
       GROUP BY 1
       ORDER BY 1""") { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "6 hours").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_events"), col("n_users"), col("sum_value"))
      .orderBy(col("window_start"))
  }

  /** q29 — session windows (30-minute inactivity gap) per user, batch
    * form via `session_window`. The DuckDB oracle derives identical
    * sessions with the classic gaps-and-islands window construction —
    * which is also the proof the operator semantics are standard.
    */
  val q29 = oracled(
    "q29_session_window",
    "session_window(gap 30min) per user vs gaps-and-islands oracle",
    """WITH marked AS (
         SELECT user_id, ts,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
         FROM events),
       sess AS (
         SELECT user_id,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
         FROM marked),
       per_session AS (
         SELECT user_id, sid, COUNT(*) AS n FROM sess GROUP BY user_id, sid)
       SELECT user_id,
         COUNT(*) AS n_sessions,
         CAST(SUM(n) AS BIGINT) AS n_events,
         CAST(MAX(n) AS BIGINT) AS max_session_events
       FROM per_session
       GROUP BY user_id
       ORDER BY user_id""") { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n")).as("n_events"),
        max(col("n")).as("max_session_events"))
      .orderBy(col("user_id"))
  }

  /** q59 — sliding window (12h length, 6h slide): each event lands in
    * exactly two overlapping windows. The oracle materializes the same
    * two window starts per event with a UNION ALL of shifted
    * epoch-floors — an independent derivation of `window()`'s overlap
    * semantics.
    */
  val q59 = oracled(
    "q59_time_window_sliding",
    "12h/6h sliding window aggregation (overlap factor 2)",
    """WITH slid AS (
         SELECT CAST(to_timestamp(floor(epoch(ts) / 21600) * 21600) AS TIMESTAMP) AS ws, value FROM events
         UNION ALL
         SELECT CAST(to_timestamp(floor(epoch(ts) / 21600) * 21600 - 21600) AS TIMESTAMP) AS ws, value FROM events)
       SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM slid
       GROUP BY 1
       ORDER BY 1""") { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "12 hours", "6 hours").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_events"), col("sum_value"))
      .orderBy(col("window_start"))
  }

  val all: Seq[GQuery] = Seq(q25, q26, q27, q28, q29, q59)
}
