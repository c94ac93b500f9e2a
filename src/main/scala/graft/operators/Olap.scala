package graft.operators

import org.apache.spark.sql.{Column}
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

  /** q109 — incremental mart rollup: the daily-ETL pattern where each
    * day's shard persists a PARTIAL aggregate (day × type counts and
    * exact-decimal sums) and the serving query re-aggregates shards —
    * never re-scanning raw history. Proven equal to the direct
    * aggregate over raw events (sum-of-sums == sum because the partials
    * are decimal-exact and partition the rows). At 100 TB this is the
    * difference between scanning yesterday's shard and scanning years
    * of raw events on every dashboard load.
    */
  val q109 = oracled(
    "q109_incremental_mart",
    "per-day partial-aggregate shards re-aggregated == direct aggregate",
    """WITH shard AS (
         SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
           COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS sv
         FROM events GROUP BY 1, 2)
       SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_events,
         CAST(SUM(sv) AS DOUBLE) AS sum_value,
         CAST(COUNT(*) AS BIGINT) AS n_shards
       FROM shard GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
    val shards = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec2(col("value"))).as("sv"))
    shards.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        sum(col("sv")).cast("double").as("sum_value"),
        count(lit(1)).as("n_shards"))
      .orderBy(col("event_type"))
  }

  /** q110 — CDC latest-wins compaction: collapse an event stream to the
    * newest record per key (order by event time, id as the
    * deterministic tiebreak at the shared microsecond precision) — the
    * upsert-materialization step every change-capture ingest runs. One
    * window shuffle on the key; at scale this is the standard
    * merge-on-read compaction shape.
    */
  val q110 = oracled(
    "q110_latest_by_key",
    "latest-record-per-key compaction (CDC upsert materialization)",
    """WITH r AS (
         SELECT user_id, event_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
             ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
         FROM events)
       SELECT user_id, event_id, event_type FROM r WHERE rn = 1
       ORDER BY user_id""") { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .orderBy(col("user_id"))
  }

  /** q111 — z-order locality: interleave the bits of two join/filter
    * dimensions (Morton code) and compare per-range dimension spans
    * against a row-major layout. A z-range bounds BOTH dimensions
    * (32×32 tiles here), so min/max file statistics prune scans for
    * predicates on EITHER dimension — the OPTIMIZE ZORDER layout trick,
    * expressed as pure bit arithmetic (identical unrolled spread in the
    * oracle). Row-major ranges bound only the leading dimension; the
    * output shows sy_span ≈ full width there vs ≤ 31 under z-order.
    */
  val q111 = oracled(
    "q111_zorder_locality",
    "Morton-interleaved layout bounds both dims per range; row-major only one",
    """WITH b AS (
         SELECT CAST(l_partkey % 256 AS BIGINT) AS px,
                CAST(l_suppkey % 256 AS BIGINT) AS sy
         FROM lineitem),
       s1 AS (SELECT px, sy, ((px | (px << 4)) & 3855) AS px1,
                ((sy | (sy << 4)) & 3855) AS sy1 FROM b),
       s2 AS (SELECT px, sy, ((px1 | (px1 << 2)) & 13107) AS px2,
                ((sy1 | (sy1 << 2)) & 13107) AS sy2 FROM s1),
       s3 AS (SELECT px, sy, ((px2 | (px2 << 1)) & 21845) AS px3,
                ((sy2 | (sy2 << 1)) & 21845) AS sy3 FROM s2),
       coded AS (SELECT px, sy, (px3 | (sy3 << 1)) AS zval,
                (px * 256 + sy) AS rmval FROM s3),
       z AS (SELECT 'zorder' AS layout, zval // 1024 AS rng, px, sy FROM coded
             UNION ALL
             SELECT 'rowmajor' AS layout, rmval // 1024 AS rng, px, sy FROM coded)
       SELECT layout, rng, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MAX(px) - MIN(px) AS BIGINT) AS px_span,
         CAST(MAX(sy) - MIN(sy) AS BIGINT) AS sy_span
       FROM z GROUP BY layout, rng ORDER BY layout, rng""") { (s, dir) =>
    def spread(c: Column): Column = {
      val a = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(lit(3855L))
      val b = a.bitwiseOR(shiftleft(a, 2)).bitwiseAND(lit(13107L))
      b.bitwiseOR(shiftleft(b, 1)).bitwiseAND(lit(21845L))
    }
    val coded = Tables.lineitem(s, dir)
      .select((col("l_partkey") % 256).cast("long").as("px"),
        (col("l_suppkey") % 256).cast("long").as("sy"))
      .withColumn("zval", spread(col("px")).bitwiseOR(shiftleft(spread(col("sy")), 1)))
      .withColumn("rmval", col("px") * 256 + col("sy"))
    val z = coded.select(lit("zorder").as("layout"),
        expr("zval div 1024").as("rng"), col("px"), col("sy"))
      .union(coded.select(lit("rowmajor").as("layout"),
        expr("rmval div 1024").as("rng"), col("px"), col("sy")))
    z.groupBy(col("layout"), col("rng"))
      .agg(count(lit(1)).as("n"),
        (max(col("px")) - min(col("px"))).as("px_span"),
        (max(col("sy")) - min(col("sy"))).as("sy_span"))
      .orderBy(col("layout"), col("rng"))
  }

  /** q136 — incremental aggregate maintenance: per-type stats computed
    * as a MERGE of two partial aggregates (history = event_id % 10 != 0,
    * delta batch = event_id % 10 = 0) instead of a full rescan.
    * count/sum/min/max are mergeable; avg is DERIVED from the merged sum
    * and count — the classic reason a maintained aggregate stores
    * (sum, count), never avg. The DuckDB oracle computes the same stats
    * in one full aggregate, so hash-equality IS the algebraic proof that
    * merge(partial(history), partial(delta)) == full recompute. At
    * 100 TB the history partial is a persisted |group|-row table: each
    * arriving batch costs O(|batch|) plus a merge over |group| rows —
    * history is never rescanned. The DECIMAL(18,2) sum keeps the merge
    * order-independent (double sums would drift between merge orders),
    * and the maintained aggregate is PUBLISHED in exact integer units
    * (ROUNDDIV burndown, VERDICT r10 #7): sum_value_cents is the
    * decimal sum ×100 cast once to BIGINT, and avg_value_x4 =
    * cents·100 div n (value is non-negative by the events schema, so
    * floor division agrees across engines) — no double arithmetic or
    * ROUND policy anywhere in the output.
    */
  val q136 = oracled(
    "q136_incremental_agg",
    "merge of history+delta partial aggregates == full-recompute oracle (integer-cent output)",
    """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS sum_value_cents,
         MIN(value) AS min_value, MAX(value) AS max_value,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) * 100
           // COUNT(*) AS avg_value_x4
       FROM events GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
    val ev = Tables.events(s, dir)
    def partial(batch: org.apache.spark.sql.DataFrame) =
      batch.groupBy(col("event_type")).agg(
        count(lit(1)).as("p_n"),
        sum(dec2(col("value"))).as("p_sum"),
        min(col("value")).as("p_min"),
        max(col("value")).as("p_max"))
    val history = partial(ev.filter(col("event_id") % 10 =!= 0))
    val delta = partial(ev.filter(col("event_id") % 10 === 0))
    history.unionByName(delta)
      .groupBy(col("event_type"))
      .agg(
        sum(col("p_n")).as("n"),
        (sum(col("p_sum")) * 100).cast("long").as("sum_value_cents"),
        min(col("p_min")).as("min_value"),
        max(col("p_max")).as("max_value"))
      .withColumn("avg_value_x4", expr("sum_value_cents * 100 div n"))
      .select(col("event_type"), col("n"), col("sum_value_cents"),
        col("min_value"), col("max_value"), col("avg_value_x4"))
      .orderBy(col("event_type"))
  }

  /** q140 — anti-entropy table checksums: per (source, bucket) content
    * digests for replica/version reconciliation WITHOUT moving data —
    * two sides exchange 80 digest rows, compare, and recurse only into
    * mismatched buckets (the Merkle/anti-entropy protocol shape; at
    * 100 TB this is how you audit a replicated lake, not row-by-row
    * diffing). The digest is an order- and partition-independent
    * modular sum of per-row hashes (commutative + associative, so any
    * execution order agrees), built from overflow-safe arithmetic both
    * engines share (operands bounded before multiply — ANSI-safe, the
    * q129 rule). Row-level identity comes from doc_id; content
    * sensitivity from n_chars, lang, and the text head.
    */
  val q140 = oracled(
    "q140_table_checksum",
    "order-independent per-(source, bucket) Merkle digests for reconciliation",
    """SELECT source, doc_id % 16 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(((doc_id % 100003) * 2654435761
                   + n_chars * 97
                   + ascii(lang) * 131
                   + length(text) % 100000 * 7) % 1000000007) % 1000000007
           AS BIGINT) AS digest
       FROM documents
       GROUP BY source, doc_id % 16
       ORDER BY source, bucket""") { (s, dir) =>
    val rowHash = (((col("doc_id") % 100003) * 2654435761L)
      + col("n_chars") * 97
      + ascii(col("lang")) * 131
      + length(col("text")) % 100000 * 7) % 1000000007L
    Tables.documents(s, dir)
      .groupBy(col("source"), (col("doc_id") % 16).as("bucket"))
      .agg(count(lit(1)).as("n"),
        (sum(rowHash) % 1000000007L).as("digest"))
      .orderBy(col("source"), col("bucket"))
  }

  /** q141 — snapshot diff: classify every key across two table versions
    * as added / removed / changed / unchanged via a single key-
    * co-partitioned full outer join (v2 is a deterministic mutation of
    * `documents`, so the oracle derives the identical snapshot). The
    * output is the reconciliation summary per change class with id-sum
    * witnesses — the row-level drill-down a q140 bucket mismatch
    * recurses into. At 100 TB the FOJ shuffles both sides once on the
    * join key; layout-bucketed snapshots (Publish.publishPartitioned)
    * make it exchange-free, and the q140 digests cut it to changed
    * buckets only.
    */
  val q141 = oracled(
    "q141_snapshot_diff",
    "added/removed/changed/unchanged classification across table versions",
    """WITH v2 AS (
         SELECT doc_id, n_chars + CASE WHEN doc_id % 13 = 0 THEN 7 ELSE 0 END AS n_chars
         FROM documents WHERE doc_id % 97 <> 0
         UNION ALL
         SELECT doc_id + 1000000, n_chars FROM documents WHERE doc_id % 101 = 0),
       j AS (
         SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.n_chars <> b.n_chars THEN 'changed'
                ELSE 'unchanged' END AS change_type
         FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
       SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(doc_id) AS BIGINT) AS id_sum
       FROM j GROUP BY change_type ORDER BY change_type""") { (s, dir) =>
    val v1 = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    val v2 = v1.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"),
        (col("n_chars") + when(col("doc_id") % 13 === 0, 7).otherwise(0)).as("n_chars"))
      .unionByName(v1.filter(col("doc_id") % 101 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("n_chars")))
    v1.alias("a").join(v2.alias("b"), col("a.doc_id") === col("b.doc_id"), "full_outer")
      .select(
        coalesce(col("a.doc_id"), col("b.doc_id")).as("doc_id"),
        when(col("a.doc_id").isNull, "added")
          .when(col("b.doc_id").isNull, "removed")
          .when(col("a.n_chars") =!= col("b.n_chars"), "changed")
          .otherwise("unchanged").as("change_type"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("change_type"))
  }

  /** Delta boundary for the join-IVM demonstration (q195): rows at or
    * after it are "today's arrivals" on both inputs.
    */
  private val IvmCutoff = "1997-07-01"

  /** q195 — incremental maintenance of a JOIN view: the per-customer
    * revenue view over orders ⋈ lineitem, maintained by the delta
    * algebra Δ(O ⋈ L) = ΔO⋈L₀ ∪ O₀⋈ΔL ∪ ΔO⋈ΔL instead of recomputed.
    * q136 maintains an AGGREGATE under append; a JOIN view needs the
    * three cross terms — the identity every materialized-view engine
    * and every stream-stream join is built on. The Spark side computes
    * ONLY the incremental path (four branch joins whose partial
    * aggregates re-merge by summation — counts and exact cent sums are
    * commutative monoids, so partial re-aggregation is lossless);
    * the DuckDB oracle computes the naive full join — the hash gate IS
    * the proof that the algebra loses nothing. At scale the O₀⋈L₀ term
    * is the stored view (never recomputed) and only the delta-sized
    * terms run per refresh; all four run here because the fixture
    * stores nothing between invocations (the honest cost note — this
    * query demonstrates the ALGEBRA, its plan is 4 joins vs 1).
    */
  val q195 = oracled(
    "q195_join_view_ivm",
    "join-view delta maintenance (three cross terms + base) == naive recompute",
    """WITH j AS (
         SELECT o_custkey,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         FROM orders JOIN lineitem ON l_orderkey = o_orderkey)
       SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(c) AS BIGINT) AS revenue_cents
       FROM j GROUP BY o_custkey ORDER BY o_custkey""") { (s, dir) =>
    val cut = lit(IvmCutoff).cast("date")
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
      (col("o_orderdate").cast("date") >= cut).as("is_delta"))
    val l = Tables.lineitem(s, dir).select(col("l_orderkey"),
      (dec2(col("l_extendedprice")) * 100).cast("long").as("c"),
      (col("l_shipdate").cast("date") >= cut).as("is_delta"))
    def term(oDelta: Boolean, lDelta: Boolean) =
      o.filter(col("is_delta") === oDelta).drop("is_delta")
        .join(l.filter(col("is_delta") === lDelta).drop("is_delta"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("pn"), sum(col("c")).as("ps"))
    Seq(term(false, false), term(false, true), term(true, false), term(true, true))
      .reduce(_ unionByName _)
      .groupBy(col("o_custkey"))
      .agg(sum(col("pn")).as("n_items"), sum(col("ps")).as("revenue_cents"))
      .orderBy(col("o_custkey"))
  }

  /** q241 — hierarchical (BOM-style) subtree rollup: every node's
    * totals over its whole subtree in a fixed 4-ary item hierarchy
    * (parent(i) = (i−1) div 4, root 0) — the bill-of-materials /
    * org-rollup shape warehouses usually reach for recursive CTEs to
    * get. With an ARITHMETIC hierarchy the ancestor chain is CLOSED
    * FORM (≤5 ancestors per node), so the whole rollup is: one
    * per-item aggregate over the fact scan, an explode of each item
    * row to its ancestor list, and a re-aggregate — no recursion, no
    * iteration, and the explode touches 100×5 rows, not the fact
    * table. Depth comes from the same chain arithmetic. The oracle
    * states the identical chain with nested CASE levels.
    */
  val q241 = oracled(
    "q241_hierarchy_rollup",
    "subtree totals over a closed-form 4-ary hierarchy: explode ancestors + re-aggregate",
    """WITH per AS (SELECT event_id % 100 AS item,
           CAST(COUNT(*) AS BIGINT) AS own_n,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS own_c
         FROM events GROUP BY 1),
       ch AS (SELECT *,
           CASE WHEN item > 0 THEN (item - 1) // 4 END AS l1 FROM per),
       ch2 AS (SELECT *,
           CASE WHEN l1 > 0 THEN (l1 - 1) // 4 END AS l2 FROM ch),
       ch3 AS (SELECT *,
           CASE WHEN l2 > 0 THEN (l2 - 1) // 4 END AS l3 FROM ch2),
       ch4 AS (SELECT *,
           CASE WHEN l3 > 0 THEN (l3 - 1) // 4 END AS l4 FROM ch3),
       up AS (SELECT unnest(list_filter([item, l1, l2, l3, l4],
             x -> x IS NOT NULL)) AS node, own_n, own_c
         FROM ch4),
       sub AS (SELECT node, CAST(SUM(own_n) AS BIGINT) AS subtree_n,
           CAST(SUM(own_c) AS BIGINT) AS subtree_c
         FROM up GROUP BY 1),
       dep AS (SELECT item AS node,
           CAST(CASE WHEN l1 IS NULL THEN 0 WHEN l2 IS NULL THEN 1
                WHEN l3 IS NULL THEN 2 WHEN l4 IS NULL THEN 3
                ELSE 4 END AS BIGINT) AS depth,
           own_n, own_c
         FROM ch4)
       SELECT d.node, d.depth, d.own_n, d.own_c AS own_cents,
         s.subtree_n, s.subtree_c AS subtree_cents
       FROM dep d JOIN sub s ON s.node = d.node
       ORDER BY d.node""") { (s, dir) =>
    val per = Tables.events(s, dir)
      .groupBy((col("event_id") % 100).as("item"))
      .agg(count(lit(1)).as("own_n"),
        sum((dec2(col("value")) * 100).cast("long")).as("own_c"))
      .withColumn("l1", when(col("item") > 0,
        expr("(item - 1) div 4")))
      .withColumn("l2", when(col("l1") > 0, expr("(l1 - 1) div 4")))
      .withColumn("l3", when(col("l2") > 0, expr("(l2 - 1) div 4")))
      .withColumn("l4", when(col("l3") > 0, expr("(l3 - 1) div 4")))
    val sub = per
      .select(explode(filter(
          array(col("item"), col("l1"), col("l2"), col("l3"), col("l4")),
          x => x.isNotNull)).as("node"),
        col("own_n"), col("own_c"))
      .groupBy(col("node"))
      .agg(sum(col("own_n")).as("subtree_n"),
        sum(col("own_c")).as("subtree_c"))
    per
      .select(col("item").as("node"),
        when(col("l1").isNull, 0L).when(col("l2").isNull, 1L)
          .when(col("l3").isNull, 2L).when(col("l4").isNull, 3L)
          .otherwise(4L).as("depth"),
        col("own_n"), col("own_c").as("own_cents"))
      .join(sub, Seq("node"))
      .select(col("node"), col("depth"), col("own_n"), col("own_cents"),
        col("subtree_n"), col("subtree_c").as("subtree_cents"))
      .orderBy(col("node"))
  }

  /** The q264 Hilbert steps, s = 64 … 1: each step reads the PREVIOUS
    * state (x, y, d) and emits the flipped/swapped quadrant-local
    * coordinates plus the distance contribution s²·((3·rx) XOR ry) —
    * the standard xy→d walk, unrolled so both engines run the
    * identical straight-line integer program (no recursion, no UDF;
    * Spark keeps it inside whole-stage codegen).
    */
  private val HilbertSteps = Seq(64, 32, 16, 8, 4, 2, 1)

  private def hilbertStepSql(s: Int): String =
    s"""CASE WHEN (y & $s) = 0 THEN
          CASE WHEN (x & $s) > 0 THEN $s - 1 - y ELSE y END
        ELSE x END AS x,
       CASE WHEN (y & $s) = 0 THEN
          CASE WHEN (x & $s) > 0 THEN $s - 1 - x ELSE x END
        ELSE y END AS y,
       d + ${s.toLong * s} * xor(
         3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
         (CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)) AS d"""

  /** q264 — HILBERT vs MORTON range contiguity: the part of the
    * data-layout story q111 does NOT cover. Both curves tile the
    * 128×128 key space into the same 64-cell blocks (any order-k
    * space-filling curve fills aligned subsquares contiguously), so
    * per-block min/max pruning — q111's subject — is identical; what
    * differs is the ORDER blocks are visited, i.e. how many CONTIGUOUS
    * KEY RANGES a 2-D query footprint dissolves into. Fewer ranges =
    * fewer seeks / scan splits at 100 TB (the reason Hilbert is the
    * curve in production layouts that care: its successor step is
    * always an adjacent cell, Morton's jumps). Both keys are exact
    * integer programs (Morton: 7-bit interleave; Hilbert: the
    * [[HilbertSteps]] unrolled flip/swap walk — bijectivity pinned in
    * ScaleSpec); per occupied block the output carries rows, the
    * needed flag under the deliberately TILE-UNALIGNED rectangle
    * x∈[30,45], y∈[14,29], and run_start — whether a needed block
    * begins a new contiguous run (lag over needed blocks in key
    * order): Σ run_start IS the seek count, gated per layout.
    */
  val q264 = oracled(
    "q264_hilbert_locality",
    "Hilbert vs Morton: contiguous-run dissection of a 2-D query footprint, exact both engines",
    s"""WITH pts AS (SELECT l_partkey % 128 AS x0,
           CAST(FLOOR(l_quantity) AS BIGINT) % 128 AS y0
         FROM lineitem),
       h0 AS (SELECT x0, y0, x0 AS x, y0 AS y, CAST(0 AS BIGINT) AS d
         FROM pts),
       ${HilbertSteps.zipWithIndex.map { case (s, i) =>
           s"h${i + 1} AS (SELECT x0, y0, ${hilbertStepSql(s)} FROM h$i)"
         }.mkString(",\n       ")},
       keyed AS (SELECT x0, y0, d AS hkey,
           ${(0 until 7).map(i =>
             s"(((x0 >> $i) & 1) << ${2 * i}) + (((y0 >> $i) & 1) << ${2 * i + 1})")
             .mkString(" + ")} AS zkey
         FROM h${HilbertSteps.size}),
       blk AS (
         SELECT 'hilbert' AS layout, hkey // 64 AS block, COUNT(*) AS n_rows,
             MAX(CASE WHEN x0 BETWEEN 30 AND 45 AND y0 BETWEEN 14 AND 29
                 THEN 1 ELSE 0 END) AS needed
           FROM keyed GROUP BY 2
         UNION ALL
         SELECT 'morton', zkey // 64, COUNT(*),
             MAX(CASE WHEN x0 BETWEEN 30 AND 45 AND y0 BETWEEN 14 AND 29
                 THEN 1 ELSE 0 END)
           FROM keyed GROUP BY 2),
       runs AS (SELECT layout, block, n_rows, needed,
           CASE WHEN needed = 1 AND COALESCE(LAG(block) OVER (
               PARTITION BY layout, needed ORDER BY block), -2) <> block - 1
             THEN 1 ELSE 0 END AS run_start
         FROM blk)
       SELECT layout, CAST(block AS BIGINT) AS block,
         CAST(n_rows AS BIGINT) AS n_rows, CAST(needed AS BIGINT) AS needed,
         CAST(run_start AS BIGINT) AS run_start
       FROM runs ORDER BY layout, block""") { (s, dir) =>
    val pts = Tables.lineitem(s, dir)
      .select((col("l_partkey") % 128).as("x0"),
        (floor(col("l_quantity")).cast("long") % 128).as("y0"))
    var st = pts.select(col("x0"), col("y0"), col("x0").as("x"),
      col("y0").as("y"), lit(0L).as("d"))
    for (step <- HilbertSteps)
      st = st.select(col("x0"), col("y0"),
        expr(s"CASE WHEN (y & $step) = 0 THEN " +
          s"CASE WHEN (x & $step) > 0 THEN $step - 1 - y ELSE y END " +
          s"ELSE x END").as("x"),
        expr(s"CASE WHEN (y & $step) = 0 THEN " +
          s"CASE WHEN (x & $step) > 0 THEN $step - 1 - x ELSE x END " +
          s"ELSE y END").as("y"),
        expr(s"d + ${step.toLong * step} * " +
          s"((3 * (CASE WHEN (x & $step) > 0 THEN 1 ELSE 0 END)) ^ " +
          s"(CASE WHEN (y & $step) > 0 THEN 1 ELSE 0 END))").as("d"))
    val zkey = (0 until 7).map(i =>
        shiftleft(shiftright(col("x0"), i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(col("y0"), i).bitwiseAND(lit(1L)), 2 * i + 1))
      .reduce(_ + _)
    val keyed = st.select(col("x0"), col("y0"), col("d").as("hkey"))
      .withColumn("zkey", zkey)
    val needed = when(col("x0").between(30, 45) && col("y0").between(14, 29),
      1L).otherwise(0L)
    def blocks(layout: String, key: String) = keyed
      .groupBy(expr(s"$key div 64").as("block"))
      .agg(count(lit(1)).as("n_rows"), max(needed).as("needed"))
      .select(lit(layout).as("layout"), col("block"), col("n_rows"),
        col("needed"))
    val w = Window.partitionBy(col("layout"), col("needed"))
      .orderBy(col("block"))
    blocks("hilbert", "hkey").unionByName(blocks("morton", "zkey"))
      .withColumn("run_start",
        when(col("needed") === 1 &&
          coalesce(lag(col("block"), 1).over(w), lit(-2L)) =!= col("block") - 1,
          1L).otherwise(0L))
      .orderBy(col("layout"), col("block"))
  }

  val all: Seq[GQuery] =
    Seq(q25, q26, q27, q28, q29, q59, q109, q110, q111, q136, q140, q141,
      q195, q241, q264)
}
