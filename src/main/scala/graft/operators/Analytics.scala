package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GQuery
import graft.GQuery.oracled
import graft.sources.Tables
import graft.functions.GraftFunctions._

/** Third-ring analytics surface (round 2): statistical aggregates,
  * distribution and value window functions, conditional aggregation,
  * regexp scalars, unpivot, edit-distance near-dup, and deterministic
  * hash sampling. The reference has none of these (SURVEY.md §2.2 —
  * its only aggregates are count/sum, its only scalars split/parse/
  * abs/sqrt/clamp); each is the Spark-first expression of a capability
  * a complete engine at 100 TB needs.
  *
  * Scale notes per query are on the member Scaladoc; everything here is
  * a single hash aggregate, a single window pass, or a blocked
  * equi-join — no cross products, no driver-side materialization.
  */
object Analytics {

  /** q65 — moment-based statistical aggregates per group: sample
    * stddev/variance, covariance and Pearson correlation of quantity vs
    * price. One pass, partial-aggregated (each is a merge of
    * (n, Σx, Σx², Σxy…) moments, so map-side combine applies exactly as
    * for sum/count). Doubles rounded 6dp: Spark's distributed moment
    * merge and DuckDB's serial one differ in final ulps.
    */
  val q65 = oracled(
    "q65_stat_aggregates",
    "stddev/variance/covariance/correlation per returnflag, one pass",
    """SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
       ROUND(var_samp(l_quantity), 6) AS var_qty,
       ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
       FROM lineitem
       GROUP BY l_returnflag
       ORDER BY l_returnflag""") { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(var_samp(col("l_quantity")), 6).as("var_qty"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qty_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  /** q66 — distribution window functions: quartile bucket (ntile),
    * percent_rank, cume_dist over customer balances within market
    * segment. The ORDER BY includes the unique custkey so ntile's bucket
    * assignment is total-order deterministic. One window pass = one
    * shuffle on the partition key.
    */
  val q66 = oracled(
    "q66_window_distribution",
    "ntile/percent_rank/cume_dist per market segment",
    """SELECT c_custkey, c_mktsegment,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
       FROM customer
       WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
       ORDER BY c_custkey""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("c_custkey"))
  }

  /** q67 — conditional / selective aggregation: count_if, bool_and /
    * bool_or, and max_by / min_by (argmax over the unique orderkey so
    * tie-breaking is well-defined). All are one-pass hash aggregates;
    * the oracle spells count_if as SUM(CASE...) to stay ANSI.
    */
  val q67 = oracled(
    "q67_conditional_agg",
    "count_if / bool_and / bool_or / max_by / min_by per order status",
    """SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       max_by(o_orderpriority, o_orderkey) AS latest_key_priority,
       min_by(o_orderpriority, o_orderkey) AS earliest_key_priority
       FROM orders
       GROUP BY o_orderstatus
       ORDER BY o_orderstatus""") { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        count_if(col("o_totalprice") > 200000).as("n_big"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"),
        max_by(col("o_orderpriority"), col("o_orderkey")).as("latest_key_priority"),
        min_by(col("o_orderpriority"), col("o_orderkey")).as("earliest_key_priority"))
      .orderBy(col("o_orderstatus"))
  }

  /** q68 — regexp scalar functions: group extraction, replacement, full
    * matching, and match counting. Patterns stick to character classes +
    * anchors — the subset where Java regex (Spark) and RE2 (DuckDB)
    * agree. All codegen'd scalar ops, fully pushdown-friendly.
    */
  val q68 = oracled(
    "q68_regexp_funcs",
    "regexp extract/replace/like/count over part names and brands",
    """SELECT p_partkey,
       CAST(regexp_extract(p_brand, '#([0-9]+)$', 1) AS BIGINT) AS brand_num,
       regexp_replace(p_name, '[aeiou]', '*', 'g') AS name_devoweled,
       (p_name SIMILAR TO '[a-z]+ [a-z]+') AS two_words,
       CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels
       FROM part
       WHERE regexp_matches(p_type, '^(ECONOMY|SMALL)$')
       ORDER BY p_partkey""") { (s, dir) =>
    Tables.part(s, dir)
      .filter(col("p_type").rlike("^(ECONOMY|SMALL)$"))
      .select(col("p_partkey"),
        regexp_extract(col("p_brand"), "#([0-9]+)$", 1).cast("long").as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("name_devoweled"),
        col("p_name").rlike("^[a-z]+ [a-z]+$").as("two_words"),
        size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0))).cast("long").as("n_vowels"))
      .orderBy(col("p_partkey"))
  }

  /** q69 — unpivot (wide → long): per-returnflag measure columns melted
    * into (measure, value) rows with the Dataset.unpivot operator — the
    * inverse of q60's pivot. Planned as a single Expand over the
    * aggregated (6-row) input; the oracle spells it as UNION ALL, the
    * ANSI-portable equivalent.
    */
  val q69 = oracled(
    "q69_unpivot",
    "melt per-flag sum_qty/sum_price/n_rows measures into long form",
    """WITH agg AS (
         SELECT l_returnflag,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price,
           CAST(COUNT(*) AS DOUBLE) AS n_rows
         FROM lineitem GROUP BY l_returnflag)
       SELECT l_returnflag, measure, value FROM (
         SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM agg
         UNION ALL
         SELECT l_returnflag, 'sum_price', sum_price FROM agg
         UNION ALL
         SELECT l_returnflag, 'n_rows', n_rows FROM agg)
       ORDER BY l_returnflag, measure""") { (s, dir) =>
    val agg = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        dec2(sum(dec2(col("l_quantity")))).cast("double").as("sum_qty"),
        dec2(sum(dec2(col("l_extendedprice")))).cast("double").as("sum_price"),
        count(lit(1)).cast("double").as("n_rows"))
    agg.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("n_rows")),
        "measure", "value")
      .orderBy(col("l_returnflag"), col("measure"))
  }

  /** q70 — edit-distance near-dup: Levenshtein distance ≤ 8 between
    * 40-char document prefixes within (lang, source) blocks, computed
    * by SEGMENT-PIGEONHOLE candidate generation + banded-DP verify
    * ([[graft.operators.Dedup.passJoinEditPairs]], which carries the
    * completeness proof). The previous plan was an all-pairs join
    * inside the blocks — but the fixture's block COUNT is fixed, so
    * block sizes are corpus-proportional and the pair join grew as
    * corpus² (the suite's slowest sf1 query at 90 s); the PassJoin
    * candidate equi-join replaces it with bounded per-doc fan-out and
    * co-occurrence-mass shuffle, while the brute-force oracle still
    * hash-matches exactly (generation is provably complete,
    * verification exact).
    */
  val q70 = oracled(
    "q70_edit_distance_near_dup",
    "prefix Levenshtein <= 8 within (lang, source) blocks",
    """WITH p AS (
         SELECT doc_id, lang, source, substr(text, 1, 40) AS pfx
         FROM documents)
       SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         CAST(levenshtein(x.pfx, y.pfx) AS BIGINT) AS dist
       FROM p x JOIN p y
         ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
       WHERE levenshtein(x.pfx, y.pfx) <= 8
       ORDER BY doc_a, doc_b""") { (s, dir) =>
    Dedup.passJoinEditPairs(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("source"),
            substring(col("text"), 1, 40).as("pfx")), 8)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q71 — value window functions over each customer's order history:
    * first/last order price in the running frame and the second order's
    * price (nth_value) over the full partition. Frames are explicit —
    * last_value over the default frame is a famous footgun, so the
    * full-partition frame is spelled out on both engines.
    */
  val q71 = oracled(
    "q71_window_value_funcs",
    "first_value/last_value/nth_value over per-customer order history",
    """SELECT o_orderkey, o_custkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER wfull AS last_price,
       nth_value(o_totalprice, 2) OVER wfull AS second_price
       FROM orders
       WINDOW
         w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
         wfull AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       ORDER BY o_orderkey""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(wfull).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(wfull).as("second_price"))
      .orderBy(col("o_orderkey"))
  }

  /** q72 — deterministic hash sampling: a reproducible ~10% Bernoulli
    * sample selected by pure integer arithmetic (Knuth multiplicative
    * hash mod 2³²), not `TABLESAMPLE`/`rand()` — the discipline a
    * training-data pipeline needs so a sample is stable across reruns,
    * engines, and partitionings. The filter is a pushdown-able scalar
    * predicate; at 100 TB it runs scan-side with zero shuffle.
    */
  val q72 = oracled(
    "q72_hash_sample",
    "reproducible 10% sample via multiplicative hash on doc_id",
    """SELECT doc_id, lang, source
       FROM documents
       WHERE (doc_id * 2654435761) % 4294967296 < 429496730
       ORDER BY doc_id""") { (s, dir) =>
    Tables.documents(s, dir)
      .filter(knuthHashMod < lit(429496730L))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** (doc_id * 2654435761) mod 2^32 computed in DECIMAL(38,0) so the
    * multiply stays total over the full BIGINT id range — the BIGINT
    * form overflows (ANSI ArithmeticException) once doc_id exceeds
    * ~3.4e9, which contradicts the scan-side-at-100TB posture. Identical
    * values to the BIGINT form wherever that form is defined, so the
    * DuckDB oracle keeps the plain integer expression.
    */
  private def knuthHashMod: Column =
    (col("doc_id").cast("decimal(20,0)") * lit(2654435761L)) % lit(4294967296L)

  /** q75 — stratified deterministic sampling (the `sampleBy` operator
    * made reproducible): per-stratum Bernoulli fractions — 50% for
    * single-digit sources, 10% otherwise — selected by the same
    * multiplicative hash as q72, so the sample is stable across runs,
    * engines, and partitionings. Per-stratum thresholds are a CASE
    * expression, i.e. still a single scan-side filter with no shuffle;
    * the trailing aggregate reports realized rates per stratum.
    */
  val q75 = oracled(
    "q75_stratified_sample",
    "per-source stratified hash sampling with realized-rate audit",
    """WITH sampled AS (
         SELECT source,
           (doc_id * 2654435761) % 4294967296 < CASE
             WHEN source SIMILAR TO 'src[0-9]' THEN 2147483648
             ELSE 429496730 END AS keep
         FROM documents)
       SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       FROM sampled
       GROUP BY source
       ORDER BY source""") { (s, dir) =>
    val keep = knuthHashMod <
      when(col("source").rlike("^src[0-9]$"), lit(2147483648L)).otherwise(lit(429496730L))
    Tables.documents(s, dir)
      .select(col("source"), keep.as("keep"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_total"),
        count_if(col("keep")).as("n_kept"))
      .orderBy(col("source"))
  }

  /** q82 — bitmap-based EXACT distinct counting: keys map to
    * (bucket, bit position), per-(group, bucket) bitmaps build with
    * `bitmap_construct_agg`, partial bitmaps OR-merge, and the distinct
    * count is the sum of set bits. This is the scalable exact
    * COUNT(DISTINCT) pattern — the shuffle carries fixed-size bitmaps
    * per (group, bucket) instead of every distinct key, mergeable across
    * any partitioning (unlike a naive distinct, whose shuffle width is
    * the key cardinality). Verified against the naive COUNT(DISTINCT)
    * oracle.
    */
  val q82 = oracled(
    "q82_bitmap_distinct",
    "exact distinct customers per order status via mergeable bitmaps",
    """SELECT o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
       FROM orders
       GROUP BY o_orderstatus
       ORDER BY o_orderstatus""") { (s, dir) =>
    val perBucket = Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"), bitmap_bucket_number(col("o_custkey")).as("bucket"))
      .agg(bitmap_construct_agg(bitmap_bit_position(col("o_custkey"))).as("bm"))
    perBucket
      .groupBy(col("o_orderstatus"))
      .agg(sum(bitmap_count(col("bm"))).as("n_customers"))
      .orderBy(col("o_orderstatus"))
  }

  /** q90 — ordered string aggregation: per-nation roster of its three
    * richest customers as one delimited string. `collect_list` has no
    * deterministic order (partition race), so the contract is
    * sort-then-join — `array_join(sort_array(...))` — mirrored by the
    * oracle's `string_agg(... ORDER BY ...)`. The top-3 cut happens in a
    * ranking window BEFORE the collect, so the aggregate state is
    * bounded per group no matter the group's size.
    */
  val q90 = oracled(
    "q90_string_agg",
    "per-nation ordered roster string of top-3 customers by balance",
    """WITH ranked AS (
         SELECT c_nationkey, c_name,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey) AS rn
         FROM customer)
       SELECT c_nationkey,
         string_agg(c_name, '|' ORDER BY c_name) AS roster
       FROM ranked WHERE rn <= 3
       GROUP BY c_nationkey
       ORDER BY c_nationkey""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy(col("c_nationkey"))
      .agg(array_join(sort_array(collect_list(col("c_name"))), "|").as("roster"))
      .orderBy(col("c_nationkey"))
  }

  /** q91 — histogram by arithmetic bucketing: order totals bucketed into
    * fixed-width bins with pure integer math (floor(x/width)), counts
    * and bin bounds per bin. One hash aggregate over a derived key; at
    * 100 TB this is the profile query that runs scan→agg with no sort
    * until the bounded bin list.
    */
  val q91 = oracled(
    "q91_histogram",
    "fixed-width histogram of order totals (arithmetic bucketing)",
    """SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bin,
       CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) * 50000.0 AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_in_bin,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_in_bin
       FROM orders
       GROUP BY 1
       ORDER BY bin""") { (s, dir) =>
    val bin = floor(col("o_totalprice") / 50000.0).cast("long")
    Tables.orders(s, dir)
      .groupBy(bin.as("bin"))
      .agg(
        count(lit(1)).as("n"),
        min(dec2(col("o_totalprice"))).cast("double").as("min_in_bin"),
        max(dec2(col("o_totalprice"))).cast("double").as("max_in_bin"))
      .select(col("bin"), (col("bin") * 50000.0).as("bin_lo"),
        col("n"), col("min_in_bin"), col("max_in_bin"))
      .orderBy(col("bin"))
  }

  /** q134 — rolling z-score anomaly detection: per user, each event's
    * value against the trailing-20-event mean/σ; |x−μ| > 3σ flags the
    * outlier — the standard streaming-metrics monitor, in its batch
    * form. The moment sums (Σv, Σv²) are EXACT DECIMAL window
    * aggregates, so μ and σ derive deterministically from exact inputs
    * — a float stddev's accumulation order differs between engines (and
    * plan variants), which would make a 3σ boundary row flicker across
    * the threshold. One window shuffle on user_id.
    */
  val q134 = oracled(
    "q134_rolling_anomaly",
    "trailing-20-event 3-sigma outliers per user (decimal-exact moments)",
    """WITH w AS (
         SELECT user_id, event_id, CAST(value AS DECIMAL(18,2)) AS v,
           SUM(CAST(value AS DECIMAL(18,2))) OVER fr AS s,
           SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) OVER fr AS ss,
           COUNT(*) OVER fr AS n
         FROM events
         WINDOW fr AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
       z AS (
         SELECT user_id, event_id, CAST(v AS DOUBLE) AS value,
           CAST(s AS DOUBLE)/n AS mu,
           CASE WHEN n > 1 THEN
             sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/n)/(n-1)) END AS sd,
           n
         FROM w)
       SELECT user_id, event_id, value, mu, sd
       FROM z WHERE n >= 10 AND sd > 0 AND abs(value - mu) > 3*sd
       ORDER BY user_id, event_id""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val fr = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-19, Window.currentRow)
    val v = dec2(col("value"))
    val withMoments = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), v.as("v"))
      .withColumn("s", sum(col("v")).over(fr))
      .withColumn("ss", sum(col("v") * col("v")).over(fr))
      .withColumn("n", count(lit(1)).over(fr))
    withMoments
      .select(col("user_id"), col("event_id"),
        col("v").cast("double").as("value"),
        (col("s").cast("double") / col("n")).as("mu"),
        when(col("n") > 1,
          sqrt((col("ss").cast("double") - col("s").cast("double") * col("s").cast("double") / col("n"))
            / (col("n") - 1))).as("sd"),
        col("n"))
      .filter(col("n") >= 10 && col("sd") > 0 &&
        abs(col("value") - col("mu")) > lit(3) * col("sd"))
      .select(col("user_id"), col("event_id"), col("value"), col("mu"), col("sd"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q135 — 2-D skyline (Pareto frontier): parts no other part
    * dominates on (size, price) — the multi-criteria "best offers"
    * operator. Computed as the classic sort-sweep: two running maxes
    * over the size ordering (RANGE frames split strictly-greater from
    * greater-or-equal, so the dominance quantifier ∃a: (s_a>s_b ∧
    * p_a≥p_b) ∨ (s_a≥s_b ∧ p_a>p_b) becomes two window comparisons) —
    * O(n log n) against the oracle's O(n²) NOT EXISTS, two independent
    * formulations of the same definition. Scale shape: a LOCAL skyline
    * pass first (the same sweep partitioned on a deterministic hash
    * bucket — any point dominated within its bucket is dominated
    * globally, so local survivors are a superset of the global skyline),
    * then the single-partition final sweep runs only over those
    * survivors. The global window sees O(skyline × buckets) rows, not
    * the table, so the one-task stage stays bounded at 100×.
    */
  val q135 = oracled(
    "q135_skyline",
    "2-D Pareto frontier via local-then-global sort-sweep (== NOT EXISTS dominance oracle)",
    """SELECT p_partkey, p_size, p_retailprice FROM part b
       WHERE NOT EXISTS (
         SELECT 1 FROM part a
         WHERE a.p_size >= b.p_size AND a.p_retailprice >= b.p_retailprice
           AND (a.p_size > b.p_size OR a.p_retailprice > b.p_retailprice))
       ORDER BY p_partkey""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    def sweep(partCols: Seq[org.apache.spark.sql.Column])(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val gt = Window.partitionBy(partCols: _*).orderBy(col("p_size").desc)
        .rangeBetween(Window.unboundedPreceding, -1)
      val ge = Window.partitionBy(partCols: _*).orderBy(col("p_size").desc)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn("max_gt", max(col("p_retailprice")).over(gt))
        .withColumn("max_ge", max(col("p_retailprice")).over(ge))
        .filter((col("max_gt").isNull || col("max_gt") < col("p_retailprice"))
          && col("max_ge") <= col("p_retailprice"))
        .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
    }
    // bucket count follows the session's shuffle parallelism (ADVICE r5:
    // a hardcoded 32 capped the pre-filter's parallelism on bigger
    // clusters); any bucket count is correct — superset property
    val buckets = s.sessionState.conf.numShufflePartitions.max(1)
    val base = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .withColumn("bkt", pmod(hash(col("p_partkey")), lit(buckets)))
    val localSurvivors = sweep(Seq(col("bkt")))(base)
    sweep(Seq.empty)(localSurvivors).orderBy(col("p_partkey"))
  }

  /** q138 — per-vertex triangle counting on the co-rating affinity graph
    * (users sharing >= 14 distinct (item, rating) agreements, derived
    * from events exactly as `ml.Recommender.ratings`). The Spark plan is
    * the scalable degree-oriented enumeration: orient every edge from
    * its lower-(degree, id) endpoint, self-join oriented adjacency on
    * the source to enumerate each wedge once, then close the wedge with
    * a third equi-join — the "compact-forward" shape that bounds
    * per-vertex join fan-out by out-degree <= O(sqrt(|E|)) regardless of
    * hub skew, which is what survives a power-law graph at 100 TB. The
    * DuckDB oracle enumerates the same triangles by id-ordered 3-way
    * join (a<b<c); both count each triangle exactly once, so the
    * per-vertex participation counts hash-match across two genuinely
    * different enumeration orders.
    */
  val q138 = oracled(
    "q138_triangle_count",
    "per-user triangle counts, degree-oriented wedge join == id-ordered oracle",
    s"""WITH r AS (SELECT DISTINCT user_id, event_id % 100 AS item_id,
          CAST(FLOOR(value) AS BIGINT) % 5 + 1 AS rating FROM events),
        rc AS (SELECT user_id, item_id, rating FROM (
            SELECT user_id, item_id, rating,
              ROW_NUMBER() OVER (PARTITION BY item_id, rating
                ORDER BY (user_id % 100003) * 2654435761 % 1000000007,
                  user_id) AS rn
            FROM r) t
          WHERE rn <= ${Graph.CoRatingGroupCap}),
        e AS (SELECT a.user_id AS ua, b.user_id AS ub
          FROM rc a JOIN rc b
            ON a.item_id = b.item_id AND a.rating = b.rating
           AND a.user_id < b.user_id
          GROUP BY 1, 2 HAVING COUNT(*) >= 14),
        t AS (SELECT e1.ua AS x, e1.ub AS y, e2.ub AS z
          FROM e e1 JOIN e e2 ON e1.ub = e2.ua
                    JOIN e e3 ON e3.ua = e1.ua AND e3.ub = e2.ub),
        v AS (SELECT x AS user_id FROM t
              UNION ALL SELECT y FROM t
              UNION ALL SELECT z FROM t)
       SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
       FROM v GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
    coRatingTriangles(s, dir).orderBy(col("user_id"))
  }

  /** One triangle computation per data dir, over the SHARED co-rating
    * edge table ([[Graph.coRatingGraph]] — also feeds q152 PageRank and
    * q154 BFS): q138 lists the counts, q158 derives the clustering
    * coefficient. Persisted as a 2-column per-vertex parquet artifact.
    */
  private def coRatingTriangles(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.Memo.artifact(s, dir, "co_rating_triangles")( {
      val (edges, _) = Graph.coRatingGraph(s, dir)
      // the directed table holds both orientations; keep the ua < ub half
      val und = edges.filter(col("src") < col("dst"))
        .select(col("src").as("ua"), col("dst").as("ub"))
      triangleCounts(und)
    })

  /** Per-vertex triangle counts of an undirected simple graph given as
    * a deduped (ua < ub) edge list — the degree-oriented wedge join
    * q138 runs on the co-rating graph, factored out so AnalyticsSpec
    * can prove it equals brute-force enumeration on adversarial
    * (hub-skewed) graphs. Output: (user_id, n_triangles).
    */
  private[graft] def triangleCounts(
      edges: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val deg = edges.select(col("ua").as("v"))
      .unionByName(edges.select(col("ub").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // orient each edge lower-(degree, id) -> higher; carry the (deg, id)
    // rank of the head so wedge endpoints order without re-joining deg
    def rank(d: Column, i: Column) = struct(d.as("d"), i.as("i"))
    val aRank = rank(col("da.deg"), col("ua"))
    val bRank = rank(col("db.deg"), col("ub"))
    val aLess = aRank < bRank
    val o = edges
      .join(deg.alias("da"), col("ua") === col("da.v"))
      .join(deg.alias("db"), col("ub") === col("db.v"))
      .select(
        when(aLess, col("ua")).otherwise(col("ub")).as("src"),
        when(aLess, col("ub")).otherwise(col("ua")).as("dst"),
        when(aLess, bRank).otherwise(aRank).as("dst_rank"))
      .localCheckpoint() // three self-join scans below; compute the orientation once
    val tri = o.alias("o1")
      .join(o.alias("o2"),
        col("o1.src") === col("o2.src")
          && col("o1.dst_rank") < col("o2.dst_rank"))
      .join(o.alias("o3"),
        col("o3.src") === col("o1.dst") && col("o3.dst") === col("o2.dst"))
      .select(col("o1.src").as("x"), col("o1.dst").as("y"), col("o2.dst").as("z"))
    tri.select(col("x").as("user_id"))
      .unionByName(tri.select(col("y").as("user_id")))
      .unionByName(tri.select(col("z").as("user_id")))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("user_id"))
  }

  /** q145 — grouped closed-form OLS: per-lang regression of token count
    * on character count from the five sufficient moments (n, Σx, Σy,
    * Σxy, Σx²; plus Σy² for r²) — in-engine analytics with ONE
    * aggregation pass and no iteration. The moments are exact BIGINT
    * sums (x and y are integers), so the partial-aggregate merge is
    * order-independent, and (ROUNDDIV burndown, VERDICT r10 #7) the
    * OUTPUT is the q234/q235 integer-rational template — the three
    * statistics as exact numerator/denominator pairs over the shared
    * covariance denominators, NO division performed:
    *   slope     = slope_num / den        (n·Σxy − Σx·Σy, n·Σxx − Σx²)
    *   intercept = int_num / den          (Σy·Σxx − Σx·Σxy — the
    *               nested-division-free closed form over the SAME den)
    *   r²        = slope_num² / (den·deny)  (deny = n·Σyy − Σy²;
    *               published unsquared — squaring would overflow BIGINT
    *               ~3·10⁹ rows before the moments themselves do)
    * Magnitude note: every output stays < 2^63 up to ~10^13 rows of
    * this shape; past that the same plan runs on DECIMAL(38,0) sums —
    * operator unchanged. At 100 TB: one scan, one shuffle of 6 longs
    * per lang.
    */
  val q145 = oracled(
    "q145_grouped_regression",
    "per-lang closed-form OLS from exact integer moments (rational num/den output)",
    """WITH t AS (SELECT lang, n_chars AS x,
          len(string_split(trim(text), ' ')) AS y FROM documents),
       m AS (SELECT lang, COUNT(*) AS n,
          SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
          SUM(x*x) AS sxx, SUM(y*y) AS syy
         FROM t GROUP BY lang)
       SELECT lang, CAST(n AS BIGINT) AS n,
         CAST(n*sxy - sx*sy AS BIGINT) AS slope_num,
         CAST(n*sxx - sx*sx AS BIGINT) AS den,
         CAST(sy*sxx - sx*sxy AS BIGINT) AS int_num,
         CAST(n*syy - sy*sy AS BIGINT) AS deny
       FROM m ORDER BY lang""") { (s, dir) =>
    val x = col("n_chars")
    val y = size(split(trim(col("text")), " ")).cast("long")
    val m = Tables.documents(s, dir)
      .select(col("lang"), x.as("x"), y.as("y"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    m.select(col("lang"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den"),
        (col("sy") * col("sxx") - col("sx") * col("sxy")).as("int_num"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("deny"))
      .orderBy(col("lang"))
  }

  /** q146 — cohort retention: users bucketed by first-activity week,
    * activity counted per (cohort, week-offset) — the classic retention
    * triangle. The cohort comes from a window min over the per-user
    * partition (NOT a groupBy + self-join: one shuffle instead of two,
    * and the distinct user-week grid is already the right grain to
    * window over). Weeks are Monday-truncated on both engines, so the
    * day difference is exactly divisible by 7 and the offset is integer
    * division — no calendar drift. At 100 TB the user-partitioned
    * window and the final rollup are the only exchanges.
    */
  val q146 = oracled(
    "q146_cohort_retention",
    "retention triangle: first-activity-week cohorts x week offset",
    """WITH uw AS (SELECT DISTINCT user_id,
          CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
       c AS (SELECT user_id, wk,
          MIN(wk) OVER (PARTITION BY user_id) AS cohort FROM uw)
       SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
         CAST(datediff('day', cohort, wk) // 7 AS BIGINT) AS week_offset,
         CAST(COUNT(*) AS BIGINT) AS n_active_users
       FROM c GROUP BY 1, 2 ORDER BY 1, 2""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val uw = Tables.events(s, dir)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    uw.withColumn("cohort",
        min(col("wk")).over(Window.partitionBy(col("user_id"))))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        expr("datediff(wk, cohort) div 7").cast("long").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** q148 — event-transition matrix (first-order Markov estimate): per
    * user, consecutive event pairs under (ts, event_id) total order via
    * one lead() window; transition probabilities normalize each row of
    * the matrix with a window sum over the TINY (|types|²) aggregate,
    * not the event stream. The q76 bigram-LM shape on behavioral data:
    * same estimator, different sequence carrier (window over a keyed
    * stream vs arrays in a row). One user-partitioned shuffle for the
    * lag + one rollup — nothing else moves at 100 TB. The probability
    * is published as the exact rational (n, row_total) pair — the
    * q234/q235 template (ROUNDDIV burndown, VERDICT r10 #7); p =
    * n/row_total is derivable, no float in the gate.
    */
  val q148 = oracled(
    "q148_event_transitions",
    "per-user consecutive event-type transitions + exact rational row-normalizers",
    """WITH s AS (
         SELECT user_id, event_type AS cur,
           LEAD(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS nxt
         FROM events),
       c AS (SELECT cur, nxt, COUNT(*) AS n FROM s
             WHERE nxt IS NOT NULL GROUP BY cur, nxt)
       SELECT cur, nxt, CAST(n AS BIGINT) AS n,
         CAST(SUM(n) OVER (PARTITION BY cur) AS BIGINT) AS row_total
       FROM c ORDER BY cur, nxt""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val seqW = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val c = Tables.events(s, dir)
      .select(col("user_id"), col("event_type").as("cur"),
        lead(col("event_type"), 1).over(seqW).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
    c.select(col("cur"), col("nxt"), col("n"),
        sum(col("n")).over(Window.partitionBy(col("cur"))).as("row_total"))
      .orderBy(col("cur"), col("nxt"))
  }

  /** q151 — the 100 TB plan for q66's distribution window functions.
    * q66 demonstrates the native API; its window partitions on the
    * 5-value market segment, so each segment's entire share of the
    * table sorts in ONE task at scale. This twin computes the
    * hash-identical result with every per-row pass bounded:
    * `rn` comes from [[graft.plans.PrefixSum.withRowNumber]]'s two-level
    * bucketed scan; tie-class min/max ranks come from a shuffle join on
    * the high-cardinality (segment, balance) tie key; the distribution
    * functions are then pure arithmetic — percent_rank = (rank-1)/(n-1),
    * cume_dist = max-tie-rn/n, ntile(4) from rn and n by the standard
    * first-(n mod 4)-buckets-take-one-extra rule. Same oracle as q66.
    */
  val q151 = oracled(
    "q151_distribution_scale_rank",
    "q66's ntile/percent_rank/cume_dist via two-level distributed rank",
    """SELECT c_custkey, c_mktsegment,
       CAST(ntile(4) OVER wu AS INT) AS quartile,
       percent_rank() OVER wt AS pct_rank,
       cume_dist() OVER wt AS cume
       FROM customer
       WINDOW wu AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey),
              wt AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
       ORDER BY c_custkey""") { (s, dir) =>
    val base = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val ranked = graft.plans.PrefixSum.withRowNumber(
      base, "rn", Seq("c_mktsegment"), "c_acctbal",
      tiebreaks = Seq(col("c_custkey")))
    val segN = base.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    // ties share a balance, so their min (= rank()) and max (= the rank
    // cume_dist counts to) aggregate on the tie key itself — a
    // high-cardinality shuffle, never a per-segment sort. The oracle's
    // pct_rank/cume window therefore orders by balance ALONE (real tie
    // semantics — the whole point of the tie-class derivation); only
    // ntile keeps the unique custkey tiebreak, because ntile splits tie
    // groups by underlying order and would be nondeterministic without
    // it. The sf0.1 gate caught the earlier version using the unique
    // order for all three: duplicate balances first appear at that
    // scale, and cume was one tie-member high per duplicate.
    val ties = ranked.groupBy(col("c_mktsegment"), col("c_acctbal"))
      .agg(min(col("rn")).as("tie_lo"), max(col("rn")).as("tie_hi"))
    ranked.join(ties, Seq("c_mktsegment", "c_acctbal"))
      .join(broadcast(segN), "c_mktsegment")
      .withColumn("q4", expr("n div 4"))
      .withColumn("r4", col("n") % 4)
      .withColumn("thr", (col("q4") + 1) * col("r4"))
      .withColumn("quartile",
        when(col("rn") <= col("thr"), expr("(rn - 1) div (q4 + 1) + 1"))
          .otherwise(expr("r4 + (rn - thr - 1) div greatest(q4, 1) + 1"))
          .cast("int"))
      .withColumn("pct_rank",
        when(col("n") === 1, lit(0.0)).otherwise(
          (col("tie_lo") - 1).cast("double") / (col("n") - 1).cast("double")))
      .withColumn("cume",
        col("tie_hi").cast("double") / col("n").cast("double"))
      .select(col("c_custkey"), col("c_mktsegment"), col("quartile"),
        col("pct_rank"), col("cume"))
      .orderBy(col("c_custkey"))
  }

  /** q155 minimum support: a pair (two parts bought together in the same
    * order) is frequent if it occurs in at least this many baskets.
    */
  private val MinSupport = 3

  /** q155 — frequent-pair mining (market basket, Apriori 2-itemsets):
    * pairs of parts co-occurring in >= MinSupport orders. Spark side
    * applies the Apriori downward-closure prune FIRST: an item in fewer
    * than MinSupport baskets cannot appear in any frequent pair, so the
    * basket table is semi-joined to frequent-1 items BEFORE the
    * quadratic per-basket self-join — the step that keeps the pair
    * explosion proportional to the pruned basket width at 100 TB (on a
    * long-tail catalog most items die here). Equality with the
    * unpruned form is a theorem (support is monotone under subset), and
    * the DuckDB oracle IS the unpruned form: naive self-join + HAVING —
    * so the gate proves the optimization sound on every run. Per-basket
    * width is the other scale lever: a hub basket of width w generates
    * w²/2 pairs, so real pipelines cap or re-salt mega-baskets; the
    * fixture's baskets are bounded (7 lines max), documented rather than
    * coded around.
    */
  val q155 = oracled(
    "q155_frequent_pairs",
    "Apriori frequent 2-itemsets (pruned self-join) == naive pairs+HAVING oracle",
    s"""WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       p AS (SELECT a.l_partkey AS p1, c.l_partkey AS p2
         FROM b a JOIN b c
           ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey)
       SELECT p1, p2, CAST(COUNT(*) AS BIGINT) AS support
       FROM p GROUP BY p1, p2 HAVING COUNT(*) >= $MinSupport
       ORDER BY p1, p2""") { (s, dir) =>
    val baskets = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      // two consumers (frequent-1 scan + pruned self-join): one pass
      .localCheckpoint()
    val freq1 = baskets.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= MinSupport)
      .select(col("l_partkey"))
    val pruned = baskets.join(freq1, Seq("l_partkey"), "left_semi")
    pruned.alias("a")
      .join(pruned.alias("c"),
        col("a.l_orderkey") === col("c.l_orderkey")
          && col("a.l_partkey") < col("c.l_partkey"))
      .select(col("a.l_partkey").as("p1"), col("c.l_partkey").as("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= MinSupport)
      .orderBy(col("p1"), col("p2"))
  }

  /** q158 — local clustering coefficient: per user with degree >= 2,
    * the fraction of its neighbor pairs that are themselves connected —
    * 2·triangles / (deg·(deg−1)), the standard local transitivity
    * measure (community tightness next to q138's raw triangle counts).
    * Reuses BOTH memoized artifacts: the shared co-rating edge table
    * (degree = out-degree of the directed form, one partial-agg count)
    * and the per-vertex triangle counts (computed once for q138/q158).
    * The coefficient is published as the exact rational
    * (coeff_num, coeff_den) = (2·triangles, deg·(deg−1)) pair — the
    * q234/q235 template (ROUNDDIV burndown, VERDICT r10 #7); no double
    * anywhere, everything is exact BIGINT.
    */
  val q158 = oracled(
    "q158_clustering_coefficient",
    "local clustering coefficient from shared triangle + degree artifacts",
    s"""WITH r AS (SELECT DISTINCT user_id, event_id % 100 AS item_id,
          CAST(FLOOR(value) AS BIGINT) % 5 + 1 AS rating FROM events),
        rc AS (SELECT user_id, item_id, rating FROM (
            SELECT user_id, item_id, rating,
              ROW_NUMBER() OVER (PARTITION BY item_id, rating
                ORDER BY (user_id % 100003) * 2654435761 % 1000000007,
                  user_id) AS rn
            FROM r) t
          WHERE rn <= ${Graph.CoRatingGroupCap}),
        e AS (SELECT a.user_id AS ua, b.user_id AS ub
          FROM rc a JOIN rc b
            ON a.item_id = b.item_id AND a.rating = b.rating
           AND a.user_id < b.user_id
          GROUP BY 1, 2 HAVING COUNT(*) >= 14),
        dv AS (SELECT ua AS v FROM e UNION ALL SELECT ub FROM e),
        deg AS (SELECT v, COUNT(*) AS degree FROM dv GROUP BY v),
        t AS (SELECT e1.ua AS x, e1.ub AS y, e2.ub AS z
          FROM e e1 JOIN e e2 ON e1.ub = e2.ua
                    JOIN e e3 ON e3.ua = e1.ua AND e3.ub = e2.ub),
        tv AS (SELECT x AS v FROM t
               UNION ALL SELECT y FROM t
               UNION ALL SELECT z FROM t),
        tc AS (SELECT v, COUNT(*) AS n_triangles FROM tv GROUP BY v)
       SELECT deg.v AS user_id, CAST(deg.degree AS BIGINT) AS degree,
         CAST(COALESCE(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
         CAST(2 * COALESCE(tc.n_triangles, 0) AS BIGINT) AS coeff_num,
         CAST(deg.degree * (deg.degree - 1) AS BIGINT) AS coeff_den
       FROM deg LEFT JOIN tc ON tc.v = deg.v
       WHERE deg.degree >= 2
       ORDER BY user_id""") { (s, dir) =>
    val (edges, _) = Graph.coRatingGraph(s, dir)
    // both orientations are materialized, so out-degree IS the degree
    val deg = edges.groupBy(col("src").as("user_id"))
      .agg(count(lit(1)).as("degree"))
      .filter(col("degree") >= 2)
    deg.join(coRatingTriangles(s, dir), Seq("user_id"), "left")
      .select(col("user_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("coeff_num", lit(2) * col("n_triangles"))
      .withColumn("coeff_den", col("degree") * (col("degree") - 1))
      .orderBy(col("user_id"))
  }

  /** q160 — robust outlier screen via median absolute deviation: per
    * event_type, the median, the MAD (median of |value − median|), and
    * the count of readings beyond 3 scaled MADs — the robust alternative
    * to q134's mean/σ z-score (one corrupted burst inflates σ and hides
    * itself; the median/MAD breakdown point is 50%). Distributed shape:
    * TWO exact grouped medians with the per-group values broadcast back
    * between them — group cardinality is event-type-bounded, so the
    * broadcast is a handful of rows at any corpus size; nothing is ever
    * collected. r10 rewrite: both medians go through the shared
    * [[graft.plans.ExactQuantile]] order-statistic template on integer
    * MICRO-units (v = ⌊value·10⁶⌋ — the same double on both engines,
    * floored BEFORE the BIGINT cast because Spark truncates where
    * DuckDB rounds), retiring the engine-percentile calls that were the
    * rounds-6..8 red class. Units: the value median is ×2 micros, the
    * MAD (a median of ×2-unit deviations) is ×4 micros; the 3·1.4826
    * outlier cut is the exact integer cross-multiplication
    * 20000·|2v − med_x2| > 44478·mad_x4 (both sides ≲ 10¹⁵ — no
    * overflow, no float anywhere in the gate).
    */
  val q160 = oracled(
    "q160_mad_outliers",
    "per-type median/MAD robust outlier counts (integer order-statistic medians)",
    """WITH qsrc AS (SELECT event_type,
           CAST(FLOOR(value * 1000000) AS BIGINT) AS v
         FROM events),
       """ +
      graft.plans.ExactQuantile.oracleCtes("m", "qsrc", Seq("event_type"),
        Seq(graft.plans.ExactQuantile.Q("med_x2_us", 1, 2))) +
      """,
       dsrc AS (SELECT e.event_type,
           ABS(2 * e.v - m.med_x2_us) AS v
         FROM qsrc e JOIN mq m ON m.event_type = e.event_type),
       """ +
      graft.plans.ExactQuantile.oracleCtes("d", "dsrc", Seq("event_type"),
        Seq(graft.plans.ExactQuantile.Q("mad_x4_us", 1, 2))) +
      """
       SELECT s.event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(ANY_VALUE(m.med_x2_us) AS BIGINT) AS med_x2_us,
         CAST(ANY_VALUE(d.mad_x4_us) AS BIGINT) AS mad_x4_us,
         CAST(COUNT(*) FILTER (WHERE d.mad_x4_us > 0
           AND 20000 * ABS(2 * s.v - m.med_x2_us)
               > 44478 * d.mad_x4_us) AS BIGINT) AS n_outliers
       FROM qsrc s
       JOIN mq m ON m.event_type = s.event_type
       JOIN dq d ON d.event_type = s.event_type
       GROUP BY s.event_type ORDER BY s.event_type""") { (s, dir) =>
    import graft.plans.ExactQuantile
    // the template's contract: chained quantile calls re-scan their
    // input 3x each — persist the 2-column projection once (16 B/row;
    // Verify/Bench/PlanDump clearCache between queries, q232 precedent)
    val ev = Tables.events(s, dir).select(col("event_type"),
        floor(col("value") * 1000000).cast("long").as("v_us"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = ExactQuantile.grouped(ev, Seq("event_type"), "v_us",
      Seq(ExactQuantile.Q("med_x2_us", 1, 2)))
      .select(col("event_type"), col("med_x2_us"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("adev_x2", abs(lit(2L) * col("v_us") - col("med_x2_us")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mad = ExactQuantile.grouped(
        dev.select(col("event_type"), col("adev_x2")),
        Seq("event_type"), "adev_x2",
        Seq(ExactQuantile.Q("mad_x4_us", 1, 2)))
      .select(col("event_type"), col("mad_x4_us"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        first(col("med_x2_us")).as("med_x2_us"),
        first(col("mad_x4_us")).as("mad_x4_us"),
        count(when(col("mad_x4_us") > 0
          && lit(20000L) * col("adev_x2") > lit(44478L) * col("mad_x4_us"),
          1)).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** q169 — Benford's-law first-digit screen: the classic
    * fabricated-data / unit-mixing detector — natural multi-magnitude
    * amounts follow P(d) = log10(1 + 1/d); a flat or spiky first-digit
    * histogram flags synthetic or truncated data. One scan + a 9-row
    * aggregate: first digit extracted by STRING ops on the integer part
    * (exact — no float log in the bucketing). The fixture's
    * uniform-ish prices will rightly FAIL the screen — the operator
    * reports the evidence, not a verdict.
    *
    * Exactness (ROUNDDIV burndown, VERDICT r10 #7): the Benford
    * expectations P(d) = log10(1+1/d) are NINE constants — pinned here
    * as exact ×10⁹ integer literals (benford_x9, identical table in
    * both engines — no libm call at all), and the chi-square evidence
    * is the q147 signed-residual rational: resid_num = n_obs·10⁹ −
    * n·benford_x9, with chi2_contrib = resid_num²/(10⁹·n·benford_x9)
    * derivable. BIGINT-safe to n ≈ 9·10⁹ rows (n·10⁹ < 2^63);
    * DECIMAL(38,0) beyond — documented, not silent.
    */
  val q169 = oracled(
    "q169_benford_screen",
    "first-digit Benford histogram: exact counts + pinned x1e9 expectations + residual numerators",
    """WITH d AS (SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
             AS BIGINT) AS digit
         FROM orders WHERE o_totalprice >= 1),
       h AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY digit),
       t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM h),
       b AS (SELECT * FROM (VALUES (1, 301029996), (2, 176091259),
           (3, 124938737), (4, 96910013), (5, 79181246), (6, 66946790),
           (7, 57991947), (8, 51152522), (9, 45757491)) v(digit, benford_x9))
       SELECT h.digit, h.n_obs, t.n,
         CAST(b.benford_x9 AS BIGINT) AS benford_x9,
         CAST(h.n_obs * 1000000000 - t.n * b.benford_x9 AS BIGINT)
           AS resid_num
       FROM h CROSS JOIN t JOIN b ON b.digit = h.digit
       ORDER BY h.digit""") { (s, dir) =>
    // floor EXPLICITLY before the integer cast: Spark's double->long
    // cast truncates while DuckDB's ROUNDS half away — one price near a
    // digit boundary flips buckets and the squared chi2 term amplifies it
    val digit = substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
      .cast("long")
    val h = Tables.orders(s, dir)
      .filter(col("o_totalprice") >= 1)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val bx9 = Seq(301029996L, 176091259L, 124938737L, 96910013L,
      79181246L, 66946790L, 57991947L, 51152522L, 45757491L)
    val benford = element_at(
      array(bx9.map(lit): _*), col("digit").cast("int"))
    h.withColumn("n", sum(col("n_obs")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("digit"), col("n_obs"), col("n"),
        benford.as("benford_x9"),
        (col("n_obs") * lit(1000000000L) - col("n") * benford)
          .as("resid_num"))
      .orderBy(col("digit"))
  }

  /** q181 — equi-depth histogram of `l_extendedprice` (10 buckets):
    * the optimizer-statistics / data-profiling primitive (equi-WIDTH
    * bins hide skew; equi-DEPTH bin boundaries ARE the distribution).
    * Bucket assignment needs every row's global rank — the single-task
    * `row_number() OVER (ORDER BY ...)` trap — so the rank comes from
    * the two-level [[graft.plans.PrefixSum]] ordinal (bucket subtotals
    * + broadcast offsets; every task sorts only its own price range),
    * and the bucket is pure arithmetic on it: `(rank−1)·B div n` — the
    * same floor-division spread on both engines (NOT ntile, whose
    * front-loaded remainder distribution differs; the oracle applies
    * the identical formula to a DuckDB row_number). Per bucket: size
    * (equi-depth: sizes differ by ≤1), value bounds, and the exact
    * price mass in integer CENTS (BIGINT — the r8 probe bisection
    * convicted the driver's decimal output path, so the former
    * DECIMAL(18,2) mass is now cents ×100; DuckDB's HUGEINT sum is
    * cast back to BIGINT). Ties across a bucket edge split by the
    * (orderkey, linenumber) tiebreak identically on both engines.
    */
  val q181 = oracled(
    "q181_equidepth_histogram",
    "10-bucket equi-depth price histogram via distributed rank (two-level prefix scan)",
    """WITH r AS (
         SELECT l_extendedprice AS p,
           ROW_NUMBER() OVER (ORDER BY l_extendedprice, l_orderkey,
             l_linenumber) AS rn,
           COUNT(*) OVER () AS n
         FROM lineitem)
       SELECT CAST((rn - 1) * 10 // n AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         MIN(p) AS lo, MAX(p) AS hi,
         CAST(SUM(CAST(CAST(p AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
           AS price_mass_cents
       FROM r GROUP BY bucket ORDER BY bucket""") { (s, dir) =>
    val B = 10
    val li = Tables.lineitem(s, dir)
      .select(col("l_extendedprice").as("p"), col("l_orderkey"),
        col("l_linenumber"), lit(0).as("g"))
    val ranked = graft.plans.PrefixSum.withRowNumber(
      li, "rn", Seq("g"), "p",
      tiebreaks = Seq(col("l_orderkey"), col("l_linenumber")))
    val n = li.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("bucket", expr(s"(rn - 1) * $B div n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), min(col("p")).as("lo"),
        max(col("p")).as("hi"),
        sum((dec2(col("p")) * 100).cast("long")).as("price_mass_cents"))
      .orderBy(col("bucket"))
  }

  /** Shared by q183 + its r8 probe twin: per-segment exact winsorization
    * thresholds in TWENTIETH-OF-CENTS (c_mktsegment, lo_x20, hi_x20).
    * Spells out `quantile_cont` interpolation on exact integers so no
    * engine quantile function (and no engine-version float policy) is
    * in the loop: with per-segment values v_1..v_n ordered (1-based),
    * pos = p·(n−1), k = ⌊pos⌋, f = pos−k, q = v_{k+1} + f·(v_{k+2}−v_{k+1}).
    * For p ∈ {1/20, 19/20}, f is a twentieth, so 20·q is an exact
    * BIGINT once values are cents. Ranks come from the distributed
    * two-level [[graft.plans.PrefixSum]] ordinal (no single-task
    * window), the two selected order statistics per quantile ride a
    * 5-row broadcast.
    */
  private[operators] def winsorThresholds(s: SparkSession, dir: String): DataFrame = {
    val cents = Tables.customer(s, dir).select(col("c_mktsegment"),
      (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long").as("cents"),
      col("c_custkey"))
    val ranked = graft.plans.PrefixSum.withRowNumber(
      cents, "rn", Seq("c_mktsegment"), "cents",
      tiebreaks = Seq(col("c_custkey")))
    val st = cents.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .select(col("c_mktsegment"),
        (expr("(n - 1) div 20") + 1).as("r05a"),
        least(expr("(n - 1) div 20") + 2, col("n")).as("r05b"),
        expr("(n - 1) % 20").as("f05"),
        (expr("(19 * (n - 1)) div 20") + 1).as("r95a"),
        least(expr("(19 * (n - 1)) div 20") + 2, col("n")).as("r95b"),
        expr("(19 * (n - 1)) % 20").as("f95"))
    ranked.join(broadcast(st), Seq("c_mktsegment"))
      .filter(col("rn") === col("r05a") || col("rn") === col("r05b") ||
        col("rn") === col("r95a") || col("rn") === col("r95b"))
      .groupBy(col("c_mktsegment"), col("f05"), col("f95"))
      .agg(max(when(col("rn") === col("r05a"), col("cents"))).as("v05a"),
        max(when(col("rn") === col("r05b"), col("cents"))).as("v05b"),
        max(when(col("rn") === col("r95a"), col("cents"))).as("v95a"),
        max(when(col("rn") === col("r95b"), col("cents"))).as("v95b"))
      .select(col("c_mktsegment"),
        (lit(20L) * col("v05a") + col("f05") * (col("v05b") - col("v05a")))
          .as("lo_x20"),
        (lit(20L) * col("v95a") + col("f95") * (col("v95b") - col("v95a")))
          .as("hi_x20"))
  }

  /** The identical threshold derivation as oracle CTEs (through `p`);
    * the caller appends the final SELECT.
    */
  private[operators] val winsorOracleCtes =
    """WITH c AS (
         SELECT c_mktsegment,
           CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
           c_custkey
         FROM customer),
       r AS (
         SELECT c_mktsegment, cents,
           ROW_NUMBER() OVER (PARTITION BY c_mktsegment
             ORDER BY cents, c_custkey) AS rn
         FROM c),
       s AS (SELECT c_mktsegment, COUNT(*) AS n FROM c GROUP BY c_mktsegment),
       t AS (
         SELECT c_mktsegment, n,
           (n - 1) // 20 + 1 AS r05a, LEAST((n - 1) // 20 + 2, n) AS r05b,
           (n - 1) % 20 AS f05,
           (19 * (n - 1)) // 20 + 1 AS r95a,
           LEAST((19 * (n - 1)) // 20 + 2, n) AS r95b,
           (19 * (n - 1)) % 20 AS f95
         FROM s),
       p AS (
         SELECT t.c_mktsegment,
           20 * MAX(CASE WHEN rn = r05a THEN cents END)
             + f05 * (MAX(CASE WHEN rn = r05b THEN cents END)
                      - MAX(CASE WHEN rn = r05a THEN cents END)) AS lo_x20,
           20 * MAX(CASE WHEN rn = r95a THEN cents END)
             + f95 * (MAX(CASE WHEN rn = r95b THEN cents END)
                      - MAX(CASE WHEN rn = r95a THEN cents END)) AS hi_x20
         FROM t JOIN r ON r.c_mktsegment = t.c_mktsegment
           AND rn IN (r05a, r05b, r95a, r95b)
         GROUP BY t.c_mktsegment, f05, f95)"""

  /** q183 — per-group winsorization: clip `c_acctbal` to its segment's
    * [p05, p95] and account for the damage — the outlier-capping
    * normalization a feature/label-prep stage runs before training
    * (clipping beats dropping: rows survive, tails stop dominating
    * gradients). r8 rewrite after the r7 driver-hash failure: the
    * percentiles are no longer an engine `quantile_cont`/`percentile`
    * call (interpolation policy proved DuckDB-version-sensitive) but
    * the explicit order-statistic interpolation of [[winsorThresholds]]
    * — all-integer twentieth-of-cents on BOTH engines. The clamp +
    * accounting is one partial-aggregated pass against the 5-row
    * threshold broadcast; the winsorized mass is Σ clamped_x20, emitted
    * directly as BIGINT twentieth-of-cents (`winsorized_mass_x20`) —
    * the r8 DECIMAL(18,4) render was arithmetically exact but the probe
    * bisection convicted the driver's decimal output path, so the gate
    * column stays in the integer unit; the caller's one division is
    * ·0.0005. DuckDB's HUGEINT sum casts back to BIGINT.
    */
  val q183 = oracled(
    "q183_winsorization",
    "per-segment [p05,p95] clipping via explicit integer order-statistic interpolation",
    winsorOracleCtes +
      """
       SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE 20 * cents < lo_x20) AS BIGINT) AS n_clipped_low,
         CAST(COUNT(*) FILTER (WHERE 20 * cents > hi_x20) AS BIGINT) AS n_clipped_high,
         CAST(SUM(
           CASE WHEN 20 * cents < lo_x20 THEN lo_x20
                WHEN 20 * cents > hi_x20 THEN hi_x20
                ELSE 20 * cents END) AS BIGINT) AS winsorized_mass_x20
       FROM c JOIN p ON c.c_mktsegment = p.c_mktsegment
       GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""") { (s, dir) =>
    val cents = Tables.customer(s, dir).select(col("c_mktsegment"),
      (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long").as("cents"))
    val x20 = lit(20L) * col("cents")
    cents.join(broadcast(winsorThresholds(s, dir)), Seq("c_mktsegment"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        count(when(x20 < col("lo_x20"), 1)).as("n_clipped_low"),
        count(when(x20 > col("hi_x20"), 1)).as("n_clipped_high"),
        sum(when(x20 < col("lo_x20"), col("lo_x20"))
          .when(x20 > col("hi_x20"), col("hi_x20"))
          .otherwise(x20)).as("winsorized_mass_x20"))
      .orderBy(col("c_mktsegment"))
  }

  /** q199 — SpaceSaving heavy-hitter sketch under its merge-safe error
    * CONTRACT (the q177/q19/q165 gate style, for the top-k sketch the
    * family was missing — the count-min companion VERDICT r7 #8 asked
    * for): ONE pass folds every event's user key into a 64-counter
    * [[graft.functions.SpaceSavingAgg]] (fixed-size state, partial-agg
    * mergeable via the parallel-SpaceSaving combine), then every
    * tracked counter is audited against the EXACT per-key counts and
    * four order-independent invariants cross the gate:
    * `n_input` (stream length, exact), `n_counters` = min(64, |keys|)
    * (a full merge tree always surfaces exactly that many), and two
    * ZERO counters — `bound_violations` (a tracked key with est < true,
    * est − err > true, or err·64 > N: each bound holds per key through
    * ANY merge tree — tracked sides contribute (est, err), absent sides
    * their minimum counter to both) and `missed_heavy` (a key with
    * true·64 > 2N absent from the sketch; from the per-key bounds:
    * if such k were cut, every kept j has est_j ≥ est_k ≥ f_k, so
    * f_j ≥ f_k − N/64, and Σf_j ≤ N forces f_k ≤ 2N/64 — contradiction;
    * the textbook 1·N/m presence bound needs single-stream Σest = N,
    * which a merge tree does not preserve, hence the honest 2× margin).
    * The oracle recomputes N and |keys| exactly and emits literal
    * zeros. At 100 TB: 64 counters per partial regardless of key
    * cardinality — the frequency scan that replaces a full-domain
    * groupBy for trending-key / hot-shard detection.
    */
  val q199 = oracled(
    "q199_spacesaving_topk",
    "SpaceSaving(64) heavy-hitter sketch audited against exact counts: merge-safe bound contract",
    """WITH k AS (SELECT user_id AS k FROM events),
         n AS (SELECT COUNT(*) AS n, COUNT(DISTINCT k) AS v FROM k)
       SELECT 'bound_violations' AS metric, CAST(0 AS BIGINT) AS value FROM n
       UNION ALL SELECT 'missed_heavy', 0 FROM n
       UNION ALL SELECT 'n_counters', LEAST(64, v) FROM n
       UNION ALL SELECT 'n_input', n FROM n
       ORDER BY metric""") { (s, dir) =>
    import graft.functions.SpaceSavingAgg.spaceSavingAgg
    val m = 64
    val keys = Tables.events(s, dir).select(col("user_id").as("k"))
    val sk = keys.agg(spaceSavingAgg(col("k"), m).as("sk"),
      count(lit(1)).as("n_input")).localCheckpoint()
    val entries = sk
      // empty-sketch guard (ADVICE r8): sequence(0, -1) yields [0, -1]
      // (negative step), and element_at(sk, 0) then throws — an empty
      // sketch (empty input) must contribute no rows, not crash
      .filter(size(col("sk")) > 0)
      .select(col("n_input"),
        expr("explode(sequence(0L, CAST(size(sk) AS BIGINT) div 3 - 1))").as("i"),
        col("sk"))
      .select(col("n_input"),
        element_at(col("sk"), (col("i") * 3 + 1).cast("int")).as("key"),
        element_at(col("sk"), (col("i") * 3 + 2).cast("int")).as("est"),
        element_at(col("sk"), (col("i") * 3 + 3).cast("int")).as("err"))
    val exact = keys.groupBy(col("k")).agg(count(lit(1)).as("c"))
    val audited = entries.join(exact, col("key") === col("k")).localCheckpoint()
    val nIn = sk.select(lit("n_input").as("metric"),
      col("n_input").cast("long").as("value"))
    val nCnt = audited.agg(count(lit(1)).as("value"))
      .select(lit("n_counters").as("metric"), col("value"))
    val viol = audited
      .agg(count(when(col("est") < col("c")
        || col("est") - col("err") > col("c")
        || col("err") * m > col("n_input"), 1)).as("value"))
      .select(lit("bound_violations").as("metric"), col("value"))
    val missed = exact
      .join(broadcast(audited.select(col("key"))), col("k") === col("key"),
        "left_anti")
      .crossJoin(broadcast(sk.select(col("n_input"))))
      .agg(count(when(col("c") * m > lit(2) * col("n_input"), 1)).as("value"))
      .select(lit("missed_heavy").as("metric"), col("value"))
    viol.unionByName(missed).unionByName(nCnt).unionByName(nIn)
      .orderBy(col("metric"))
  }

  /** q210 — grouped top-k as a NATIVE AGGREGATE
    * ([[graft.functions.TopKAgg]], the fifth member of the typed-
    * aggregate family after MinHash/SimHash/CountMin/SpaceSaving): per
    * market segment, the top-3 customers by account balance. The
    * window formulation (`row_number().over(partitionBy(seg)
    * .orderBy(...))` — q12's shape) SORTS and SHUFFLES every row of
    * every group; the aggregate keeps ≤ k (score, id) pairs per
    * partial and shuffles exactly k pairs per group — at 100 TB with
    * millions of groups that is the whole fact table's sort vs a
    * k-row-per-group hash aggregate. Exact top-k is a commutative
    * associative selection, so (unlike SpaceSaving) the result is
    * merge-order-independent and the gate is PLAIN EQUALITY against
    * the window oracle — balances ride as exact integer cents, ties
    * broken (cents desc, custkey asc) identically on both sides.
    */
  val q210 = oracled(
    "q210_topk_aggregate",
    "per-segment top-3 by balance via the bounded native top-k aggregate == window oracle",
    """WITH r AS (
         SELECT c_mktsegment, c_custkey,
           CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
           ROW_NUMBER() OVER (PARTITION BY c_mktsegment
             ORDER BY CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
               DESC, c_custkey) AS rn
         FROM customer)
       SELECT c_mktsegment, CAST(rn AS BIGINT) AS rn, c_custkey, cents
       FROM r WHERE rn <= 3
       ORDER BY c_mktsegment, rn""") { (s, dir) =>
    import graft.functions.TopKAgg.topKAgg
    val cents = Tables.customer(s, dir).select(col("c_mktsegment"),
      col("c_custkey"),
      (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long").as("cents"))
    cents.groupBy(col("c_mktsegment"))
      .agg(topKAgg(col("cents"), col("c_custkey"), 3).as("tk"))
      // empty-sketch guard (ADVICE r8): a group whose scores are all
      // NULL yields an empty tk; sequence(0, -1) would step -1 and
      // element_at(tk, 0) throw — such a group contributes no rows
      .filter(size(col("tk")) > 0)
      .select(col("c_mktsegment"),
        expr("explode(sequence(0L, CAST(size(tk) AS BIGINT) div 2 - 1))").as("i"),
        col("tk"))
      .select(col("c_mktsegment"), (col("i") + 1).as("rn"),
        element_at(col("tk"), (col("i") * 2 + 2).cast("int")).as("c_custkey"),
        element_at(col("tk"), (col("i") * 2 + 1).cast("int")).as("cents"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** q191 — Welch's unequal-variance t-test between every pair of
    * return-flag populations on `l_extendedprice`: the A/B significance
    * primitive an experimentation pipeline runs per metric. The gate
    * discipline is the q145/q166 moment route: per-row exact integer
    * cents (dec2 * 100 → BIGINT), squared cents summed as
    * DECIMAL(38,0) (a BIGINT sum would overflow past ~9e4 rows of
    * ~1e14-sized squares; scale-0 decimal → double is ONE correctly
    * rounded conversion on both engines — no fractional-scale two-step
    * rounding, the q167 trap), and every statistic (means, pooled
    * variances, t, Welch–Satterthwaite df) derived from those exact
    * moments by the same IEEE double ops on both sides — bit-identical
    * with no rounding policy anywhere. Shape: ONE partial-aggregated
    * pass over lineitem (3 group rows), then a trivial pair self-join
    * of the 3-row stats table; nothing here scales with data volume
    * except the first aggregate.
    */
  val q191 = oracled(
    "q191_welch_ttest",
    "pairwise Welch t-test on exact integer moments (cents + DECIMAL(38,0) squares)",
    """WITH st AS (
         SELECT l_returnflag AS flag, COUNT(*) AS n,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sc,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS DECIMAL(38,0)) AS sc2
         FROM lineitem GROUP BY l_returnflag),
       d AS (
         SELECT flag, CAST(n AS BIGINT) AS n, sc,
           CAST(sc AS DOUBLE) / n AS m,
           (CAST(sc2 AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n)
             / (n - 1) AS v
         FROM st)
       SELECT a.flag AS flag_a, b.flag AS flag_b, a.n AS n_a, b.n AS n_b,
         a.m / 100 AS mean_a, b.m / 100 AS mean_b,
         (a.m - b.m) / sqrt(a.v / a.n + b.v / b.n) AS t_stat,
         ((a.v / a.n + b.v / b.n) * (a.v / a.n + b.v / b.n))
           / ((a.v / a.n) * (a.v / a.n) / (a.n - 1)
              + (b.v / b.n) * (b.v / b.n) / (b.n - 1)) AS df_welch
       FROM d a JOIN d b ON a.flag < b.flag
       ORDER BY flag_a, flag_b""") { (s, dir) =>
    val cents = (dec2(col("l_extendedprice")) * 100).cast("long")
    val st = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("flag"), cents.as("c"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        sum((col("c") * col("c")).cast("decimal(38,0)")).as("sc2"))
    val d = st.select(col("flag"), col("n"), col("sc"),
      (col("sc").cast("double") / col("n")).as("m"),
      ((col("sc2").cast("double")
        - col("sc").cast("double") * col("sc").cast("double") / col("n"))
        / (col("n") - 1)).as("v"))
    val a = d.alias("a")
    val b = d.alias("b")
    a.join(b, col("a.flag") < col("b.flag"))
      .select(col("a.flag").as("flag_a"), col("b.flag").as("flag_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        (col("a.m") / 100).as("mean_a"), (col("b.m") / 100).as("mean_b"),
        ((col("a.m") - col("b.m"))
          / sqrt(col("a.v") / col("a.n") + col("b.v") / col("b.n"))).as("t_stat"),
        (((col("a.v") / col("a.n") + col("b.v") / col("b.n"))
          * (col("a.v") / col("a.n") + col("b.v") / col("b.n")))
          / ((col("a.v") / col("a.n")) * (col("a.v") / col("a.n")) / (col("a.n") - 1)
            + (col("b.v") / col("b.n")) * (col("b.v") / col("b.n")) / (col("b.n") - 1)))
          .as("df_welch"))
      .orderBy(col("flag_a"), col("flag_b"))
  }

  /** q223 — A/B chi-square in EXACT integer micro-units: users
    * hash-split into two arms (user_id parity — the deterministic
    * assignment an experiment platform would persist), outcome =
    * "more purchases than errors" (balanced at this fixture, unlike
    * any ever-did-X flag, which saturates for heavy users), stratified
    * by activity tier (event count div 10 — the covariate an analysis
    * would block on). The 2×2 chi-square statistic is a RATIONAL
    * number — N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) — so both engines
    * compute it in exact wide-integer arithmetic (DECIMAL(38,0) here,
    * HUGEINT in the oracle) and emit floor(10^6·χ²) as BIGINT: no
    * sqrt, no doubles, hash-stable. Tiers with an empty margin are
    * excluded on both sides (χ² undefined). Scale shape: one
    * groupBy(user) over the event log, one groupBy(tier) over the
    * per-user table; the wide-decimal math runs on the tiny 2×2 table
    * only.
    */
  val q223 = oracled(
    "q223_ab_chisquare",
    "per-activity-tier 2×2 chi-square, exact rational → BIGINT micro-units",
    """WITH per AS (SELECT user_id,
           COUNT(*) // 10 AS tier,
           CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   > SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                THEN 1 ELSE 0 END AS conv,
           user_id % 2 AS arm
         FROM events GROUP BY user_id),
       ct AS (SELECT CAST(tier AS BIGINT) AS tier,
           CAST(SUM(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS a,
           CAST(SUM(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS b,
           CAST(SUM(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS c,
           CAST(SUM(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS d
         FROM per GROUP BY 1)
       SELECT tier, a + b + c + d AS n_users,
         a AS arm0_conv, b AS arm0_non, c AS arm1_conv, d AS arm1_non,
         CAST((1000000 * CAST(a + b + c + d AS HUGEINT)
             * CAST(a * d - b * c AS HUGEINT)
             * CAST(a * d - b * c AS HUGEINT))
           // (CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d))
           AS BIGINT) AS chi2_u6
       FROM ct
       WHERE a + b > 0 AND c + d > 0 AND a + c > 0 AND b + d > 0
       ORDER BY tier""") { (s, dir) =>
    val per = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(expr("count(1) div 10").as("tier"),
        when(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >
            sum(when(col("event_type") === "error", 1L).otherwise(0L)),
          1L).otherwise(0L).as("conv"))
      .withColumn("arm", pmod(col("user_id"), lit(2L)))
    val ct = per.groupBy(col("tier"))
      .agg(
        sum(when(col("arm") === 0 && col("conv") === 1, 1L).otherwise(0L))
          .as("a"),
        sum(when(col("arm") === 0 && col("conv") === 0, 1L).otherwise(0L))
          .as("b"),
        sum(when(col("arm") === 1 && col("conv") === 1, 1L).otherwise(0L))
          .as("c"),
        sum(when(col("arm") === 1 && col("conv") === 0, 1L).otherwise(0L))
          .as("d"))
    ct.filter(col("a") + col("b") > 0 && col("c") + col("d") > 0 &&
        col("a") + col("c") > 0 && col("b") + col("d") > 0)
      .select(col("tier"),
        (col("a") + col("b") + col("c") + col("d")).as("n_users"),
        col("a").as("arm0_conv"), col("b").as("arm0_non"),
        col("c").as("arm1_conv"), col("d").as("arm1_non"),
        expr("""(CAST(1000000 AS DECIMAL(38,0))
                  * CAST(a + b + c + d AS DECIMAL(38,0))
                  * CAST(a*d - b*c AS DECIMAL(38,0))
                  * CAST(a*d - b*c AS DECIMAL(38,0)))
                div (CAST(a + b AS DECIMAL(38,0)) * CAST(c + d AS DECIMAL(38,0))
                  * CAST(a + c AS DECIMAL(38,0)) * CAST(b + d AS DECIMAL(38,0)))
             """).as("chi2_u6"))
      .orderBy(col("tier"))
  }

  /** q236 — association rules (market-basket): for the top co-occurring
    * part pairs across orders, support, directed confidence and lift —
    * all EXACT integer ppm (conf = n_ab·10⁶ div n_a; lift =
    * n_ab·N·10⁶ div (n_a·n_b) — rationals, no doubles). The candidate
    * pass is the id-ordered basket self-join (a < b — each unordered
    * pair counted once, q138's triangle discipline) over the DISTINCT
    * (order, part) basket table; singles re-aggregate from the same
    * table; the N scalar rides in as a 1-row broadcast. Top-100 by
    * (support desc, a, b) keeps the output bounded and the tie order
    * engine-identical. Scale: baskets shuffle once on the order key;
    * pair fan-out is Σ(basket size choose 2), the Apriori floor.
    */
  val q236 = oracled(
    "q236_association_rules",
    "top basket pairs: support, confidence, lift in exact integer ppm",
    """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
         FROM lineitem),
       n1 AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS na FROM b GROUP BY 1),
       nn AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM b),
       pairs AS (SELECT x.pk AS a, y.pk AS b2,
           CAST(COUNT(*) AS BIGINT) AS nab
         FROM b x JOIN b y ON x.ok = y.ok AND x.pk < y.pk
         GROUP BY 1, 2),
       top AS (SELECT * FROM pairs ORDER BY nab DESC, a, b2 LIMIT 100)
       SELECT t.a, t.b2 AS b, t.nab,
         t.nab * 1000000 // sa.na AS conf_ab_ppm,
         t.nab * 1000000 // sb.na AS conf_ba_ppm,
         CAST(t.nab * nn.n * 1000000 // (sa.na * sb.na) AS BIGINT)
           AS lift_ppm
       FROM top t JOIN n1 sa ON sa.pk = t.a JOIN n1 sb ON sb.pk = t.b2
       CROSS JOIN nn
       ORDER BY t.nab DESC, t.a, t.b2""") { (s, dir) =>
    // r17 (guide §2.4 — remove shuffles outright): ONE order-keyed
    // aggregate builds each basket as a sorted distinct array, and the
    // a<b pairs explode ARRAY-SIDE inside the scan of that table — the
    // r16 shape paid a (ok, pk) distinct exchange plus a self-join that
    // re-shuffled the basket table twice more on ok. Singles (n1) and
    // the basket count (nn) read the same checkpointed basket table.
    // The pair fan-out Σ(basket choose 2) — the Apriori floor — is
    // unchanged, it just happens map-side before the (a, b) aggregate.
    val baskets = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("pks"))
      .localCheckpoint(false) // pairs, singles, and the count share it
    val n1 = baskets.select(explode(col("pks")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("na"))
    val nn = baskets.agg(count(lit(1)).as("n"))
    // explicit spread at the configured parallelism before the
    // quadratic explode (the q285 butterfly rule: AQE sizes stages by
    // INPUT bytes, so the small basket table coalesces to a couple of
    // partitions and the Σ(basket choose 2) fan-out would serialize)
    val pairs = baskets
      .repartition(s.sessionState.conf.numShufflePartitions)
      .select(explode(expr(
        """flatten(transform(pks, (x, i) ->
             transform(slice(pks, i + 2, size(pks)),
               y -> struct(x AS a, y AS b))))""")).as("pr"))
      .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
      .agg(count(lit(1)).as("nab"))
      .orderBy(col("nab").desc, col("a"), col("b")).limit(100)
    pairs
      .join(broadcast(n1.select(col("pk").as("a"), col("na").as("na_a"))),
        Seq("a"))
      .join(broadcast(n1.select(col("pk").as("b"), col("na").as("na_b"))),
        Seq("b"))
      .crossJoin(broadcast(nn))
      .select(col("a"), col("b"), col("nab"),
        expr("nab * 1000000 div na_a").as("conf_ab_ppm"),
        expr("nab * 1000000 div na_b").as("conf_ba_ppm"),
        expr("nab * n * 1000000 div (na_a * na_b)").as("lift_ppm"))
      .orderBy(col("nab").desc, col("a"), col("b"))
  }

  /** q237 — weighted median per group in exact integers: the
    * quantity-weighted median price per returnflag — the "typical
    * price actually paid" number plain median misstates when line
    * sizes vary. Values collapse to (group, price-cents) weight sums
    * first, so the windowed scan runs over distinct prices, not rows;
    * the pick is the first price whose doubled running weight reaches
    * the group total (the standard lower weighted median — exact
    * integer compare, no halving division). One aggregate + one
    * group-keyed window chain.
    */
  val q237 = oracled(
    "q237_weighted_median",
    "quantity-weighted median price per returnflag, exact integer rule",
    """WITH w AS (SELECT l_returnflag AS flag,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             AS pc,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
         FROM lineitem GROUP BY 1, 2),
       r AS (SELECT *,
           SUM(wt) OVER (PARTITION BY flag ORDER BY pc
             ROWS UNBOUNDED PRECEDING) AS run,
           SUM(wt) OVER (PARTITION BY flag) AS tot
         FROM w),
       p AS (SELECT *, row_number() OVER (PARTITION BY flag
             ORDER BY pc) AS rn
         FROM r WHERE 2 * run >= tot)
       SELECT flag AS l_returnflag, CAST(tot AS BIGINT) AS total_weight,
         CAST(pc AS BIGINT) AS wmedian_cents
       FROM p WHERE rn = 1 ORDER BY l_returnflag""") { (s, dir) =>
    val w = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("flag"),
        (dec2(col("l_extendedprice")) * 100).cast("long").as("pc"))
      .agg(sum(col("l_quantity").cast("long")).as("wt"))
    import org.apache.spark.sql.expressions.Window
    val wf = Window.partitionBy(col("flag"))
    val r = w
      .withColumn("run", sum(col("wt")).over(wf.orderBy(col("pc"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("wt")).over(wf))
    r.filter(col("run") * 2 >= col("tot"))
      .withColumn("rn", row_number().over(wf.orderBy(col("pc"))))
      .filter(col("rn") === 1)
      .select(col("flag").as("l_returnflag"),
        col("tot").as("total_weight"), col("pc").as("wmedian_cents"))
      .orderBy(col("l_returnflag"))
  }

  /** q238 — item-item kNN (the OTHER classic recommender, next to the
    * ALS track): each item's top-3 neighbors by rating-vector cosine
    * over the shared-user dot products. Cosine needs a sqrt — so the
    * ranking uses cos² = dot²/(‖i‖²·‖j‖²), an EXACT RATIONAL that
    * orders identically to cosine for the non-negative ratings here,
    * emitted as integer ppm. Pair dots come from the user-keyed
    * self-join (fan-out = Σ per-user items², the item-CF floor);
    * norms re-aggregate from the same distinct ratings frame;
    * neighbor selection is a per-item rank with (cos² desc, dot desc,
    * neighbor asc) — fully deterministic ties.
    */
  val q238 = oracled(
    "q238_item_knn",
    "top-3 item neighbors by exact rational cos² ppm over shared-user dots",
    """WITH r AS (SELECT DISTINCT user_id, event_id % 100 AS item,
           CAST(FLOOR(value) AS BIGINT) % 5 + 1 AS rt FROM events),
       n AS (SELECT item, CAST(SUM(rt * rt) AS BIGINT) AS nrm
         FROM r GROUP BY 1),
       d AS (SELECT a.item AS i, b.item AS j,
           CAST(SUM(a.rt * b.rt) AS BIGINT) AS dot
         FROM r a JOIN r b ON a.user_id = b.user_id AND a.item < b.item
         GROUP BY 1, 2),
       sym AS (SELECT i, j, dot FROM d
               UNION ALL SELECT j, i, dot FROM d),
       s AS (SELECT sym.i AS item_id, sym.j AS neighbor, sym.dot,
           sym.dot * sym.dot * 1000000 // (ni.nrm * nj.nrm) AS cos2_ppm
         FROM sym JOIN n ni ON ni.item = sym.i
                  JOIN n nj ON nj.item = sym.j),
       k AS (SELECT *, row_number() OVER (PARTITION BY item_id
             ORDER BY cos2_ppm DESC, dot DESC, neighbor) AS rank
         FROM s)
       SELECT item_id, CAST(rank AS BIGINT) AS rank, neighbor,
         CAST(cos2_ppm AS BIGINT) AS cos2_ppm, dot
       FROM k WHERE rank <= 3 ORDER BY item_id, rank""") { (s, dir) =>
    val r = Tables.events(s, dir)
      .select(col("user_id"), (col("event_id") % 100).as("item"),
        (floor(col("value")).cast("long") % 5 + 1).as("rt"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = r.groupBy(col("item")).agg(sum(col("rt") * col("rt")).as("nrm"))
    val d = r.alias("a").join(r.alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("i"), col("b.item").as("j"))
      .agg(sum(col("a.rt") * col("b.rt")).as("dot"))
    val sym = d.unionByName(
      d.select(col("j").as("i"), col("i").as("j"), col("dot")))
    val scored = sym
      .join(broadcast(n.select(col("item").as("i"), col("nrm").as("ni"))),
        Seq("i"))
      .join(broadcast(n.select(col("item").as("j"), col("nrm").as("nj"))),
        Seq("j"))
      .select(col("i").as("item_id"), col("j").as("neighbor"), col("dot"),
        expr("dot * dot * 1000000 div (ni * nj)").as("cos2_ppm"))
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("item_id"))
          .orderBy(col("cos2_ppm").desc, col("dot").desc, col("neighbor")))
        .cast("long"))
      .filter(col("rank") <= 3)
      .select(col("item_id"), col("rank"), col("neighbor"),
        col("cos2_ppm"), col("dot"))
      .orderBy(col("item_id"), col("rank"))
  }

  // -------------------------------------------------- SPRT sequential test

  /** SPRT log-likelihood-ratio constants in the shared
    * [[graft.functions.IntLog2]] x20 units, for H0: p=1/4 vs H1: p=1/3
    * at α=β=0.05. Each is an exact evaluation of the IntLog2 piecewise
    * formula on integer literals (AnalyticsSpec pins them against the
    * engine-side formula so the literals can never drift):
    *   SprtSucc_x20 = L2(p1/p0)        = L2(4)−L2(3)  = 2097152−1572864
    *   SprtFail_x20 = L2((1−p1)/(1−p0)) = L2(8)−L2(9)  = 3145728−3276800
    *   SprtThr_x20  = L2((1−β)/α)      = L2(19)        = 4390912
    * (lower boundary is −SprtThr_x20 by the symmetric α=β choice).
    */
  private[graft] val SprtSucc = 524288L
  private[graft] val SprtFail = -131072L
  private[graft] val SprtThr = 4390912L

  /** q262 — Wald's Sequential Probability Ratio Test as a query: per
    * event-type arm, walk the observations in arrival order, accumulate
    * the Bernoulli log-likelihood ratio for H1: p=1/3 against
    * H0: p=1/4, and report the FIRST boundary crossing — the
    * early-stopping experiment monitor (and the guardrail metric shape:
    * "did this arm's conversion drift from baseline, and how many
    * observations did it take to know"). Success is the deterministic
    * integer predicate `floor(value·100) % 4 = 0` (p=1/4 under the
    * uniform null, so H0 is true-ish and most arms should accept it).
    *
    * Exactness: the LLR increments and the Wald boundaries are the
    * [[SprtSucc]]/[[SprtFail]]/[[SprtThr]] IntLog2 x20 constants — the
    * whole walk is BIGINT sums, so the crossing index is engine-exact
    * (no float logprob ever enters the comparison).
    *
    * Shape: ONE ordered window per arm (ROWS cumsum over (ts,
    * event_id) — explicit ROWS, not Spark's RANGE default), a
    * first-crossing min-aggregate, and a per-arm totals aggregate
    * joined on the |arms|-bounded key. Scale note: a sequential test
    * is an inherently ordered scan, and its O(1)-per-arm state
    * (n, cum, decided) is the textbook STREAMING shape —
    * [[graft.streaming.SprtStream]] is the production form (stream ==
    * batch spec'd); this batch window form is the oracle twin, and its
    * per-arm partition is bounded by the arm inventory, not corpus
    * rows, only in the monitored-experiment setting it models.
    */
  /** The SPRT walk over an arbitrary (arm, ts, event_id, succ)
    * observation stream — exposed so AnalyticsSpec can drive
    * hand-built sequences with closed-form crossing indices
    * (⌈Thr/Succ⌉ = 9 consecutive successes to accept H1,
    * ⌈Thr/|Fail|⌉ = 34 consecutive failures to accept H0).
    */
  private[graft] def sprt(obs: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col("arm")).orderBy(col("ts"), col("event_id"))
    val walk = obs
      .withColumn("rn", row_number().over(ord))
      .withColumn("llr",
        when(col("succ") === 1, SprtSucc).otherwise(SprtFail))
      .withColumn("cum", sum(col("llr")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val crossed = walk
      .filter(col("cum") >= SprtThr || col("cum") <= -SprtThr)
      .groupBy(col("arm")).agg(min(col("rn")).as("n_decide"))
    val tot = walk.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_obs"), sum(col("succ")).as("n_succ"),
        sum(col("llr")).as("final_cum_x20"))
    // crossing-row recovery: |arms|-bounded after the n_decide filter
    val crossRow = walk.select(col("arm"), col("rn"), col("cum"))
      .join(broadcast(crossed), Seq("arm"))
      .filter(col("rn") === col("n_decide"))
      .select(col("arm"), col("n_decide").cast("long").as("n_decide"),
        col("cum").as("cum_at_decision_x20"))
    tot.join(broadcast(crossRow), Seq("arm"), "left")
      .select(col("arm"), col("n_obs"), col("n_succ"), col("final_cum_x20"),
        col("n_decide"), col("cum_at_decision_x20"),
        when(col("cum_at_decision_x20") >= SprtThr, "h1")
          .when(col("cum_at_decision_x20") <= -SprtThr, "h0")
          .otherwise("continue").as("decision"))
      .orderBy(col("arm"))
  }

  val q262 = oracled(
    "q262_sprt_sequential_test",
    "Wald SPRT per arm: exact-integer LLR walk, first boundary crossing, early-stop decision",
    s"""WITH obs AS (
         SELECT event_type AS arm, ts, event_id,
           CASE WHEN CAST(FLOOR(value * 100) AS BIGINT) % 4 = 0
                THEN 1 ELSE 0 END AS succ
         FROM events),
       walk AS (SELECT arm, succ,
           ROW_NUMBER() OVER w AS rn,
           SUM(CASE WHEN succ = 1 THEN $SprtSucc ELSE $SprtFail END)
             OVER (PARTITION BY arm ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM obs
         WINDOW w AS (PARTITION BY arm ORDER BY ts, event_id)),
       cross_ AS (SELECT arm, MIN(rn) AS n_decide
         FROM walk WHERE cum >= $SprtThr OR cum <= -$SprtThr GROUP BY arm),
       tot AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(SUM(succ) AS BIGINT) AS n_succ,
           CAST(SUM(CASE WHEN succ = 1 THEN $SprtSucc ELSE $SprtFail END)
             AS BIGINT) AS final_cum_x20
         FROM walk GROUP BY arm)
       SELECT tot.arm, tot.n_obs, tot.n_succ, tot.final_cum_x20,
         CAST(cross_.n_decide AS BIGINT) AS n_decide,
         CAST(w2.cum AS BIGINT) AS cum_at_decision_x20,
         CASE WHEN w2.cum >= $SprtThr THEN 'h1'
              WHEN w2.cum <= -$SprtThr THEN 'h0'
              ELSE 'continue' END AS decision
       FROM tot
       LEFT JOIN cross_ ON cross_.arm = tot.arm
       LEFT JOIN walk w2 ON w2.arm = cross_.arm AND w2.rn = cross_.n_decide
       ORDER BY tot.arm""") { (s, dir) =>
    sprt(Tables.events(s, dir).select(
      col("event_type").as("arm"), col("ts"), col("event_id"),
      when(expr("CAST(FLOOR(value * 100) AS BIGINT) % 4") === 0, 1L)
        .otherwise(0L).as("succ")))
  }

  /** q268 — OFFLINE POLICY-SWEEP REPLAY EVALUATION (the Li–Chu–
    * Langford replay estimator, fleet form): K=5 candidate
    * deterministic policies π_j(context) = action (context + j) % 5
    * are all evaluated in ONE pass over the interaction log — each
    * logged event fans out to the policies whose recommendation it
    * matches, and the per-(policy, context) matched-reward mean is the
    * replay estimate of that policy's value (unbiased under the
    * fixture's uniform logger; a stochastic logger would divide by its
    * propensity — the same rational num/den output carries it). This
    * one-pass sweep is the production shape: evaluating K policies
    * costs one log scan + one partial-agg shuffle, not K jobs. Reward
    * is exact cents; the estimate ships as the (num, den) rational
    * (q234 discipline — no engine division), n_logged restates the
    * context stratum size so the CIs are computable downstream.
    */
  val q268 = oracled(
    "q268_policy_replay",
    "K-policy one-pass replay evaluation: per (policy, context) matched-reward rational",
    """WITH log_ AS (SELECT user_id % 4 AS ctx,
           CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
             WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END AS act,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         FROM events),
       pol AS (SELECT unnest(range(0, 5)) AS policy),
       m AS (SELECT p.policy, l.ctx, l.act, l.cents,
           CASE WHEN l.act = (l.ctx + p.policy) % 5 THEN 1 ELSE 0 END
             AS matched
         FROM log_ l CROSS JOIN pol p)
       SELECT CAST(policy AS BIGINT) AS policy, ctx,
         CAST(COUNT(*) AS BIGINT) AS n_logged,
         CAST(SUM(matched) AS BIGINT) AS n_matched,
         CAST(SUM(CASE WHEN matched = 1 THEN cents ELSE 0 END) AS BIGINT)
           AS reward_num_cents,
         CAST(SUM(matched) AS BIGINT) AS reward_den
       FROM m GROUP BY 1, 2 ORDER BY policy, ctx""") { (s, dir) =>
    val log = Tables.events(s, dir).select(
      (col("user_id") % 4).as("ctx"),
      when(col("event_type") === "click", 0L)
        .when(col("event_type") === "error", 1L)
        .when(col("event_type") === "purchase", 2L)
        .when(col("event_type") === "signup", 3L)
        .otherwise(4L).as("act"),
      (dec2(col("value")) * 100).cast("long").as("cents"))
    log
      .withColumn("policy", explode(expr("sequence(0L, 4L)")))
      .withColumn("matched",
        when(col("act") === (col("ctx") + col("policy")) % 5, 1L)
          .otherwise(0L))
      .groupBy(col("policy"), col("ctx"))
      .agg(count(lit(1)).as("n_logged"),
        sum(col("matched")).as("n_matched"),
        sum(when(col("matched") === 1, col("cents")).otherwise(0L))
          .as("reward_num_cents"),
        sum(col("matched")).as("reward_den"))
      .orderBy(col("policy"), col("ctx"))
  }

  // --------------------------------------- distributed split finding

  /** q278 — PLANET-style exact decision-stump split finding: the
    * distributed tree-induction primitive (Panda et al., PLANET, VLDB
    * '09; the same histogram-then-argmin shape underlies XGBoost's
    * approx mode and every Spark MLlib tree). Label: lineitem returned
    * (l_returnflag = 'R'); three candidate features, all
    * bounded-cardinality integer encodings — quantity (1..50), discount
    * in cents (0..10), ship month (1..12). For EVERY candidate split
    * "feature ≤ v" the ledger reports the exact left/right class
    * counts and the split's misclassification error
    *   err = min(posL, negL) + min(posR, negR)
    * — the impurity kept in BIGINT because misclassification count is
    * totally ordered where Gini is a fraction with a split-dependent
    * denominator (cross-multiplied argmin doesn't fit a hash-gated
    * ledger; the scaladoc'd contract is the standard 0-1-loss stump).
    * Per feature the argmin split is flagged (ties to the smallest
    * threshold).
    *
    * Scale shape: ONE corpus scan — the 3-way feature explode feeds a
    * partial-aggregated groupBy(feature, value) whose output is
    * feature-cardinality-bounded (73 rows here, never corpus rows), so
    * the map-side combine absorbs the 3× row expansion; prefix sums and
    * the argmin run as windows over that bounded histogram. This is
    * exactly why PLANET histograms: the candidate evaluation never
    * touches the corpus again. At 100 TB: same one scan, same 73-row
    * ledger.
    */
  val q278 = oracled(
    "q278_decision_stump",
    "PLANET-style exact stump: per-split class ledger + 0-1-loss argmin over 3 features",
    """WITH base AS (SELECT
           CAST(l_quantity AS BIGINT) AS qty,
           CAST(ROUND(l_discount * 100) AS BIGINT) AS disc,
           CAST(month(l_shipdate) AS BIGINT) AS mon,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
         FROM lineitem),
       feat AS (SELECT 1 AS f, qty AS v, y FROM base
         UNION ALL SELECT 2, disc, y FROM base
         UNION ALL SELECT 3, mon, y FROM base),
       h AS (SELECT f, v, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS pos
         FROM feat GROUP BY 1, 2),
       c AS (SELECT f, v,
           CAST(SUM(n) OVER w AS BIGINT) AS nl,
           CAST(SUM(pos) OVER w AS BIGINT) AS posl,
           CAST(SUM(n) OVER (PARTITION BY f) AS BIGINT) AS nt,
           CAST(SUM(pos) OVER (PARTITION BY f) AS BIGINT) AS post
         FROM h
         WINDOW w AS (PARTITION BY f ORDER BY v ROWS UNBOUNDED PRECEDING)),
       s AS (SELECT f, v, nl AS n_left, posl AS pos_left,
           nt - nl AS n_right, post - posl AS pos_right,
           LEAST(posl, nl - posl)
             + LEAST(post - posl, (nt - nl) - (post - posl)) AS err
         FROM c WHERE nl < nt)
       SELECT CAST(f AS BIGINT) AS f, v, n_left, pos_left, n_right,
         pos_right, err,
         CAST(CASE WHEN ROW_NUMBER()
             OVER (PARTITION BY f ORDER BY err, v) = 1
           THEN 1 ELSE 0 END AS BIGINT) AS is_best
       FROM s ORDER BY f, v""") { (s, dir) =>
    val base = Tables.lineitem(s, dir).select(
      col("l_quantity").cast("long").as("qty"),
      round(col("l_discount") * 100).cast("long").as("disc"),
      month(col("l_shipdate")).cast("long").as("mon"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    val feat = base.select(explode(array(
        struct(lit(1L).as("f"), col("qty").as("v")),
        struct(lit(2L).as("f"), col("disc").as("v")),
        struct(lit(3L).as("f"), col("mon").as("v")))).as("fv"),
      col("y"))
      .select(col("fv.f").as("f"), col("fv.v").as("v"), col("y"))
    val h = feat.groupBy(col("f"), col("v"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val wCum = Window.partitionBy(col("f")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("f"))
    val c = h
      .withColumn("nl", sum(col("n")).over(wCum))
      .withColumn("posl", sum(col("pos")).over(wCum))
      .withColumn("nt", sum(col("n")).over(wTot))
      .withColumn("post", sum(col("pos")).over(wTot))
      .filter(col("nl") < col("nt"))
      .select(col("f"), col("v"),
        col("nl").as("n_left"), col("posl").as("pos_left"),
        (col("nt") - col("nl")).as("n_right"),
        (col("post") - col("posl")).as("pos_right"),
        (least(col("posl"), col("nl") - col("posl"))
          + least(col("post") - col("posl"),
            (col("nt") - col("nl")) - (col("post") - col("posl"))))
          .as("err"))
    val wBest = Window.partitionBy(col("f")).orderBy(col("err"), col("v"))
    c.withColumn("is_best",
        when(row_number().over(wBest) === 1, 1L).otherwise(0L))
      .orderBy(col("f"), col("v"))
  }

  // ------------------------------------------------ Mann-Whitney U test

  /** q296 — MANN–WHITNEY U (Wilcoxon rank-sum) for every pair of event
    * types (the NONPARAMETRIC twin of q191's Welch t-test: same "do
    * these two arms differ?" question with no normality assumption —
    * the test a metrics platform reaches for on skewed revenue
    * distributions): U is rank arithmetic, so it is EXACTLY integer
    * once midranks are doubled — each occurrence of value v in the
    * pooled sample has rank2(v) = 2·(#below) + (#equal) + 1, the U
    * statistic ×2 is R₁ₓ₂ − n₁(n₁+1), and the tie-correction term
    * Σ(t³−t) (the consumer's variance adjustment) is equally integer.
    * Ledger per (type_a < type_b): sample sizes, both U×2 values
    * (their sum is 2·n₁·n₂ — a built-in cross-check the gate hashes),
    * and the tie sum.
    *
    * Scale shape: ranks are NOT computed per row — the pooled ranking
    * collapses onto the VALUE-DOMAIN histogram (cents, bounded): one
    * partial-aggregable groupBy(type, cents) over the corpus, then a
    * 10-pair broadcast alignment and per-pair prefix sums over the
    * bounded histogram. The corpus is touched once; everything
    * rank-shaped happens on the domain, the only reason rank tests
    * scale at all.
    */
  val q296 = oracled(
    "q296_mann_whitney",
    "pairwise Mann-Whitney U x2 over the value histogram: exact midranks + tie term",
    """WITH h AS (SELECT event_type,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           CAST(COUNT(*) AS BIGINT) AS cnt
         FROM events GROUP BY 1, 2),
       ty AS (SELECT DISTINCT event_type FROM events),
       pr AS (SELECT a.event_type AS ta, b.event_type AS tb
         FROM ty a JOIN ty b ON a.event_type < b.event_type),
       ph AS (SELECT ta, tb, cents,
           CAST(SUM(ca) AS BIGINT) AS ca, CAST(SUM(cb) AS BIGINT) AS cb
         FROM (
           SELECT p.ta, p.tb, h.cents, h.cnt AS ca, 0 AS cb
           FROM pr p JOIN h ON h.event_type = p.ta
           UNION ALL
           SELECT p.ta, p.tb, h.cents, 0, h.cnt
           FROM pr p JOIN h ON h.event_type = p.tb) u
         GROUP BY 1, 2, 3),
       rk AS (SELECT ta, tb, cents, ca, cb, ca + cb AS eq,
           COALESCE(SUM(ca + cb) OVER (PARTITION BY ta, tb
             ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS less
         FROM ph),
       agg AS (SELECT ta, tb,
           CAST(SUM(ca) AS BIGINT) AS n_a,
           CAST(SUM(cb) AS BIGINT) AS n_b,
           CAST(SUM(ca * (2 * less + eq + 1)) AS BIGINT) AS r_a_x2,
           CAST(SUM(eq * eq * eq - eq) AS BIGINT) AS tie_sum
         FROM rk GROUP BY 1, 2)
       SELECT ta AS type_a, tb AS type_b, n_a, n_b,
         CAST(r_a_x2 - n_a * (n_a + 1) AS BIGINT) AS u_a_x2,
         CAST(2 * n_a * n_b - (r_a_x2 - n_a * (n_a + 1)) AS BIGINT)
           AS u_b_x2,
         tie_sum
       FROM agg ORDER BY type_a, type_b""") { (s, dir) =>
    val h = Tables.events(s, dir)
      .groupBy(col("event_type"),
        (dec2(col("value")) * 100).cast("long").as("cents"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val ty = h.select(col("event_type")).distinct()
    val pr = ty.select(col("event_type").as("ta"))
      .join(ty.select(col("event_type").as("tb")), col("ta") < col("tb"))
    val ph = broadcast(pr).join(h, col("event_type") === col("ta"))
      .select(col("ta"), col("tb"), col("cents"), col("cnt").as("ca"),
        lit(0L).as("cb"))
      .union(broadcast(pr).join(h, col("event_type") === col("tb"))
        .select(col("ta"), col("tb"), col("cents"), lit(0L).as("ca"),
          col("cnt").as("cb")))
      .groupBy(col("ta"), col("tb"), col("cents"))
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    val wLess = Window.partitionBy(col("ta"), col("tb"))
      .orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val rk = ph.withColumn("eq", col("ca") + col("cb"))
      .withColumn("less",
        coalesce(sum(col("ca") + col("cb")).over(wLess), lit(0L)))
    rk.groupBy(col("ta"), col("tb"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        sum(col("ca") * (lit(2L) * col("less") + col("eq") + 1))
          .as("r_a_x2"),
        sum(col("eq") * col("eq") * col("eq") - col("eq")).as("tie_sum"))
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("n_a"), col("n_b"),
        (col("r_a_x2") - col("n_a") * (col("n_a") + 1)).as("u_a_x2"),
        (lit(2L) * col("n_a") * col("n_b")
          - (col("r_a_x2") - col("n_a") * (col("n_a") + 1)))
          .as("u_b_x2"),
        col("tie_sum"))
      .orderBy(col("type_a"), col("type_b"))
  }

  // ------------------------------------------- chi-squared independence

  /** q297 — CHI-SQUARED independence ledger for event type × weekday
    * (the categorical independence test — is the event mix a function
    * of the day of week? — completing the stats bench: q191 Welch for
    * means, q296 Mann–Whitney for distributions, this for
    * contingency): per cell the observed count O, the expected-count
    * rational E = R·C/N, and the χ² contribution as the EXACT
    * rational pair (diff_num = N·O − R·C, chi_den = N·R·C) — the
    * consumer computes Σ diff²/den in its own precision, the gate
    * hashes only integers (squaring N·O−R·C here would overflow
    * BIGINT at ~1e6 rows× — the scaladoc-owned reason the square is
    * the CONSUMER's). Weekday is epoch-day mod 7 (1970-01-01 ≡
    * Thursday ≡ 0) — both engines' native dayofweek disagree on
    * origin, the modulo doesn't.
    *
    * Scale shape: one partial-aggregable groupBy(type, dow) — the
    * contingency table is domain-bounded (5×7); marginals and N are
    * window-free joins on that 35-row table. BIGINT-safe while
    * N·R·C < 2⁶³ (N ≈ 2e6 at the all-one-cell worst case; realistic
    * mixes reach ~1e8 rows) — past that, DECIMAL(38,0).
    */
  val q297 = oracled(
    "q297_chi_squared",
    "event-type x weekday chi-squared ledger: per-cell exact rational contributions",
    """WITH base AS (SELECT event_type,
           (CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS dow
         FROM events),
       cell AS (SELECT event_type, CAST(dow AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS o
         FROM base GROUP BY 1, 2),
       r AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rr
         FROM cell GROUP BY 1),
       c AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS cc
         FROM cell GROUP BY 1),
       nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cell)
       SELECT cell.event_type, cell.dow, cell.o,
         CAST(r.rr * c.cc AS BIGINT) AS e_num,
         nn.n AS e_den,
         CAST(nn.n * cell.o - r.rr * c.cc AS BIGINT) AS diff_num,
         CAST(nn.n * r.rr * c.cc AS BIGINT) AS chi_den
       FROM cell JOIN r USING (event_type) JOIN c USING (dow)
       CROSS JOIN nn
       ORDER BY event_type, dow""") { (s, dir) =>
    val cell = Tables.events(s, dir)
      .select(col("event_type"),
        (datediff(col("ts").cast("date"), lit("1970-01-01")) % 7)
          .cast("long").as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(false)
    val r = cell.groupBy(col("event_type")).agg(sum(col("o")).as("rr"))
    val c = cell.groupBy(col("dow")).agg(sum(col("o")).as("cc"))
    val nn = cell.agg(sum(col("o")).as("n"))
    cell.join(broadcast(r), Seq("event_type"))
      .join(broadcast(c), Seq("dow"))
      .crossJoin(broadcast(nn))
      .select(col("event_type"), col("dow"), col("o"),
        (col("rr") * col("cc")).as("e_num"), col("n").as("e_den"),
        (col("n") * col("o") - col("rr") * col("cc")).as("diff_num"),
        (col("n") * col("rr") * col("cc")).as("chi_den"))
      .orderBy(col("event_type"), col("dow"))
  }

  // ------------------------------------------------ Poisson bootstrap

  /** q301 — distributed POISSON BOOTSTRAP of mean purchase value
    * (Chamandy et al., "Estimating Uncertainty for Massive Data
    * Streams" (Google) — the bootstrap that works on one pass of a
    * distributed corpus: classic resampling needs n draws WITH
    * replacement per replicate — a shuffle per replicate — but
    * Binomial(n, 1/n) → Poisson(1), so each row independently carries
    * a Poisson(1) weight per replicate and every replicate is ONE
    * weighted aggregate): B = 64 replicates, the per-(row, replicate)
    * weight drawn by inverse-CDF over a 2²⁰-scaled integer threshold
    * table (the cumulative e⁻¹ series as SIX DECLARED integer
    * constants — rounding documented here once, both engines compare
    * against the same literals; the q92 deterministic-randomness
    * discipline via the shared hash class). Ledger: per replicate the
    * effective count and exact weighted cents sum — the replicate
    * mean is the consumer's rational (sum, n_eff); the spread across
    * the 64 rows IS the standard error the bootstrap exists to
    * estimate.
    *
    * Scale shape: one crossJoin with the 64-row replicate spine (a
    * broadcast), weights scan-local, ONE partial-aggregable
    * groupBy(b) — map-side combine absorbs the 64× expansion exactly
    * like q278's feature explode. No per-replicate shuffle, no
    * resampled copies of the corpus — the entire point of the
    * Poissonization.
    */
  val q301 = oracled(
    "q301_poisson_bootstrap",
    "64-replicate Poisson bootstrap of mean purchase cents: one pass, exact integer ledger",
    """WITH p AS (SELECT event_id,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         FROM events WHERE event_type = 'purchase'),
       reps AS (SELECT CAST(i AS BIGINT) AS b FROM range(0, 64) t(i)),
       w AS (SELECT b, cents,
           ((event_id * 64 + b) % 100003) * 2654435761 % 1048576 AS u
         FROM p CROSS JOIN reps),
       wt AS (SELECT b, cents,
           CASE WHEN u < 385749 THEN 0 WHEN u < 771499 THEN 1
             WHEN u < 964374 THEN 2 WHEN u < 1028666 THEN 3
             WHEN u < 1044739 THEN 4 WHEN u < 1047954 THEN 5
             ELSE 6 END AS wgt
         FROM w)
       SELECT b, CAST(SUM(wgt) AS BIGINT) AS n_eff,
         CAST(SUM(wgt * cents) AS BIGINT) AS sum_cents
       FROM wt GROUP BY b ORDER BY b""") { (s, dir) =>
    val p = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        (dec2(col("value")) * 100).cast("long").as("cents"))
    val reps = s.range(0, 64).select(col("id").as("b"))
    p.crossJoin(broadcast(reps))
      .withColumn("u", expr(
        "((event_id * 64 + b) % 100003) * 2654435761L % 1048576"))
      .withColumn("wgt",
        when(col("u") < 385749, 0L).when(col("u") < 771499, 1L)
          .when(col("u") < 964374, 2L).when(col("u") < 1028666, 3L)
          .when(col("u") < 1044739, 4L).when(col("u") < 1047954, 5L)
          .otherwise(6L))
      .groupBy(col("b"))
      .agg(sum(col("wgt")).as("n_eff"),
        sum(col("wgt") * col("cents")).as("sum_cents"))
      .orderBy(col("b"))
  }

  // -------------------------------------------------- RFM segmentation

  /** q302 — RFM SEGMENTATION (recency / frequency / monetary — the
    * classic customer-base decomposition, the segmentation layer the
    * q286 attribution and q301 uncertainty numbers get reported
    * against): per purchasing user, R = days from last purchase to
    * the corpus's max purchase date (a data-derived anchor, so the
    * statistic is reproducible), F = purchase count, M = total cents;
    * each metric is cut into quintiles by NTILE(5) under the
    * (metric, user_id) total order — deterministic, both engines
    * implement the standard first-(n mod 5)-buckets-get-one-extra
    * distribution. Ledger: per (r_q, f_q, m_q) segment the user
    * count and exact F/M sums — the "champions / at-risk /
    * hibernating" grid as integers.
    *
    * Scale shape: the user table is one partial-aggregable
    * groupBy(user); NTILE is a single-partition window over USERS —
    * fixture-fine, and the scaladoc owns the 100 TB substitution:
    * cutpoint-based bucketing via the [[graft.plans.ExactQuantile]]
    * order-statistic template (q58) replaces the global window when
    * the user table itself is too big for one task. The segment
    * ledger is domain-bounded (≤ 125 rows).
    */
  val q302 = oracled(
    "q302_rfm_segments",
    "RFM quintile segmentation: deterministic NTILE grid with exact per-segment sums",
    """WITH p AS (SELECT user_id, CAST(ts AS DATE) AS day,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         FROM events WHERE event_type = 'purchase'),
       mx AS (SELECT MAX(day) AS d0 FROM p),
       u AS (SELECT user_id,
           CAST((SELECT d0 FROM mx) - MAX(day) AS BIGINT) AS r_days,
           CAST(COUNT(*) AS BIGINT) AS f_cnt,
           CAST(SUM(cents) AS BIGINT) AS m_cents
         FROM p GROUP BY user_id),
       q AS (SELECT user_id, r_days, f_cnt, m_cents,
           CAST(NTILE(5) OVER (ORDER BY r_days, user_id) AS BIGINT)
             AS r_q,
           CAST(NTILE(5) OVER (ORDER BY f_cnt, user_id) AS BIGINT)
             AS f_q,
           CAST(NTILE(5) OVER (ORDER BY m_cents, user_id) AS BIGINT)
             AS m_q
         FROM u)
       SELECT r_q, f_q, m_q, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(f_cnt) AS BIGINT) AS sum_f,
         CAST(SUM(m_cents) AS BIGINT) AS sum_m_cents
       FROM q GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q""") { (s, dir) =>
    val p = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").cast("date").as("day"),
        (dec2(col("value")) * 100).cast("long").as("cents"))
    val mx = p.agg(max(col("day")).as("d0"))
    val u = p.groupBy(col("user_id"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("f_cnt"),
        sum(col("cents")).as("m_cents"))
      .crossJoin(broadcast(mx))
      .select(col("user_id"),
        datediff(col("d0"), col("last_day")).cast("long").as("r_days"),
        col("f_cnt"), col("m_cents"))
    val q = u
      .withColumn("r_q", ntile(5).over(Window.orderBy(col("r_days"),
        col("user_id"))).cast("long"))
      .withColumn("f_q", ntile(5).over(Window.orderBy(col("f_cnt"),
        col("user_id"))).cast("long"))
      .withColumn("m_q", ntile(5).over(Window.orderBy(col("m_cents"),
        col("user_id"))).cast("long"))
    q.groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"), sum(col("f_cnt")).as("sum_f"),
        sum(col("m_cents")).as("sum_m_cents"))
      .orderBy(col("r_q"), col("f_q"), col("m_q"))
  }

  // --------------------------------------------- overdispersion index

  /** q310 — OVERDISPERSION (variance-to-mean ratio) of daily arrival
    * counts per event type — the Poisson-or-clumped diagnostic that
    * decides whether q301-style Poissonization or a negative-binomial
    * model fits the arrival process (VMR = 1 is Poisson; > 1 is
    * burst/clumping — the q282 autocorrelation's single-number
    * cousin): with daily counts x over n days, the ratio is shipped
    * as the exact rational
    *   VMR = var/mean = (n·Σx² − (Σx)²) / (n·Σx)
    * (sample-variance-with-1/n convention; the q234/q295 num/den
    * template). Flag vmr_gt_1 = (num > den) rides along as the
    * integer verdict.
    *
    * Scale shape: one partial-aggregable groupBy(type, day) then one
    * groupBy(type) over the calendar-bounded series for all moments —
    * the q295 shape with a second moment. BIGINT-safe while
    * n·Σx² < 2⁶³ (centuries of daily counts at 10⁹/day).
    */
  val q310 = oracled(
    "q310_overdispersion",
    "per-type variance-to-mean ratio of daily arrivals as an exact rational + verdict",
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
         FROM events GROUP BY 1, 2),
       mo AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(x * x) AS BIGINT) AS sxx
         FROM d GROUP BY 1)
       SELECT event_type, n AS n_days, sx AS n_events,
         CAST(n * sxx - sx * sx AS BIGINT) AS vmr_num,
         CAST(n * sx AS BIGINT) AS vmr_den,
         CAST(CASE WHEN n * sxx - sx * sx > n * sx THEN 1 ELSE 0 END
           AS BIGINT) AS vmr_gt_1
       FROM mo ORDER BY event_type""") { (s, dir) =>
    val d = Tables.events(s, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    d.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n").as("n_days"),
        col("sx").as("n_events"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("vmr_num"),
        (col("n") * col("sx")).as("vmr_den"),
        when(col("n") * col("sxx") - col("sx") * col("sx")
          > col("n") * col("sx"), 1L).otherwise(0L).as("vmr_gt_1"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------- gains / lift table

  /** q312 — CUMULATIVE GAINS (lift) TABLE (the decile model-eval
    * staple next to q186's AUC and q187's calibration: if we contact
    * the top-k% of users by score, what fraction of all converters do
    * we reach?): score = the user's non-purchase activity count (the
    * naive propensity every baseline uses), outcome = has ≥ 1
    * purchase; users are cut into score deciles by NTILE(10) under
    * the (score DESC, user_id) total order (the q302 determinism
    * discipline) and the ledger carries per-decile users, positives,
    * and the running positive total — lift and capture rate are the
    * consumer's divisions of exact integers.
    *
    * Scale shape: one groupBy(user) builds the score/outcome table;
    * NTILE is a window over USERS (the q302-documented ExactQuantile
    * cutpoint substitution applies past single-task user counts); the
    * cumulative runs over the 10-row decile table.
    */
  val q312 = oracled(
    "q312_gains_table",
    "decile cumulative-gains ledger: activity-score deciles vs purchase outcome",
    """WITH u AS (SELECT user_id,
           CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0
             END) AS BIGINT) AS score,
           CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
             END) AS BIGINT) AS pos
         FROM events GROUP BY user_id),
       d AS (SELECT user_id, score, pos,
           CAST(NTILE(10) OVER (ORDER BY score DESC, user_id)
             AS BIGINT) AS decile
         FROM u),
       g AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(score) AS BIGINT) AS sum_score
         FROM d GROUP BY decile)
       SELECT decile, n_users, n_pos, sum_score,
         CAST(SUM(n_pos) OVER (ORDER BY decile
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
       FROM g ORDER BY decile""") { (s, dir) =>
    val u = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L))
          .as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("pos"))
    val d = u.withColumn("decile",
      ntile(10).over(Window.orderBy(col("score").desc, col("user_id")))
        .cast("long"))
    val g = d.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("pos")).as("n_pos"),
        sum(col("score")).as("sum_score"))
    g.withColumn("cum_pos", sum(col("n_pos")).over(
        Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("decile"), col("n_users"), col("n_pos"),
        col("sum_score"), col("cum_pos"))
      .orderBy(col("decile"))
  }

  // --------------------------------------- two-sample Kolmogorov–Smirnov

  /** q324 — TWO-SAMPLE KOLMOGOROV–SMIRNOV drift ledger for every pair of
    * languages over the document-length (n_chars) distribution — the
    * distribution-free "did this subcorpus's shape change?" test that
    * completes the q191 (Welch) / q296 (Mann–Whitney) / q297 (χ²)
    * family: Welch compares means, U compares stochastic order, KS
    * compares the WHOLE CDF, which is what a corpus-curation pipeline
    * watches when a crawl or filter quietly shifts length profiles.
    *
    * Exactness: D = sup_v |F_a(v) − F_b(v)| is attained at a jump point,
    * i.e. at some observed value, so scanning the merged value grid is
    * exact; cross-multiplying clears the denominators — ks_num =
    * max_v |cum_a(v)·n_b − cum_b(v)·n_a| is pure BIGINT, ks_ppm =
    * (10⁶·ks_num) div (n_a·n_b) computed in DECIMAL(38,0) (oracle:
    * HUGEINT), and ks_at_chars is the SMALLEST value attaining the max
    * (deterministic argmax). No float anywhere.
    *
    * Safety envelope (stated, not assumed): ks_num ≤ n_a·n_b — EQUALITY
    * is reached by fully disjoint length distributions — so the Int64
    * bound on ks_num itself is n_a·n_b ≤ 2⁶³−1, i.e. ~3×10⁹ docs in
    * each language of a pair; beyond that the cross-multiplied ledger
    * needs a wider type end-to-end. Within that envelope every derived
    * quantity here is exact: the 10⁶ ppm scaling, which WOULD wrap
    * Int64 at n_a·n_b > 9.2×10¹² (~3×10⁶ docs per language — easily
    * reached at corpus scale), runs in DECIMAL(38,0)/HUGEINT where
    * 10⁶·ks_num < 10²⁵ always fits.
    *
    * Scale shape (the q296 discipline): the corpus collapses onto the
    * VALUE-DOMAIN histogram groupBy(lang, n_chars) — one partial-agg
    * pass; pairs come from a broadcast lang×lang frame; the cumulative
    * window partitions on (lang_a, lang_b) but runs over the bounded
    * histogram (|n_chars domain| rows per pair, corpus-size-independent),
    * so the single-task-per-pair shape is domain-bounded, not
    * corpus-bounded. The argmax join-back touches only the pair ledger.
    */
  val q324 = oracled(
    "q324_ks_drift",
    "pairwise two-sample KS over doc-length CDFs: exact cross-multiplied integer statistic",
    """WITH h AS (SELECT lang, CAST(n_chars AS BIGINT) AS v,
           CAST(COUNT(*) AS BIGINT) AS cnt
         FROM documents GROUP BY 1, 2),
       lg AS (SELECT DISTINCT lang FROM documents),
       pr AS (SELECT a.lang AS la, b.lang AS lb
         FROM lg a JOIN lg b ON a.lang < b.lang),
       ph AS (SELECT la, lb, v,
           CAST(SUM(ca) AS BIGINT) AS ca, CAST(SUM(cb) AS BIGINT) AS cb
         FROM (
           SELECT p.la, p.lb, h.v, h.cnt AS ca, 0 AS cb
           FROM pr p JOIN h ON h.lang = p.la
           UNION ALL
           SELECT p.la, p.lb, h.v, 0, h.cnt
           FROM pr p JOIN h ON h.lang = p.lb) u
         GROUP BY 1, 2, 3),
       cu AS (SELECT la, lb, v,
           SUM(ca) OVER (PARTITION BY la, lb ORDER BY v
             ROWS UNBOUNDED PRECEDING) AS cum_a,
           SUM(cb) OVER (PARTITION BY la, lb ORDER BY v
             ROWS UNBOUNDED PRECEDING) AS cum_b
         FROM ph),
       tot AS (SELECT la, lb, CAST(SUM(ca) AS BIGINT) AS n_a,
           CAST(SUM(cb) AS BIGINT) AS n_b
         FROM ph GROUP BY 1, 2),
       d AS (SELECT c.la, c.lb, c.v,
           ABS(c.cum_a * t.n_b - c.cum_b * t.n_a) AS dd
         FROM cu c JOIN tot t ON t.la = c.la AND t.lb = c.lb),
       mx AS (SELECT la, lb, CAST(MAX(dd) AS BIGINT) AS ks_num
         FROM d GROUP BY 1, 2)
       SELECT m.la AS lang_a, m.lb AS lang_b, t.n_a, t.n_b, m.ks_num,
         CAST(MIN(d.v) AS BIGINT) AS ks_at_chars,
         CAST((1000000 * CAST(m.ks_num AS HUGEINT))
           // (CAST(t.n_a AS HUGEINT) * t.n_b) AS BIGINT) AS ks_ppm
       FROM mx m
       JOIN tot t ON t.la = m.la AND t.lb = m.lb
       JOIN d ON d.la = m.la AND d.lb = m.lb AND d.dd = m.ks_num
       GROUP BY 1, 2, 3, 4, 5
       ORDER BY lang_a, lang_b""") { (s, dir) =>
    ksFromHistogram(Tables.documents(s, dir)
      .groupBy(col("lang"), col("n_chars").cast("long").as("v"))
      .agg(count(lit(1)).as("cnt")))
  }

  /** The q324 KS derivation over an ARBITRARY (lang, v, cnt) histogram —
    * factored out so the streaming twin (q334: the histogram as a
    * MAINTAINED artifact via [[graft.streaming.DriftStream]]) computes
    * the identical ledger as a view over its state. See q324's scaladoc
    * for the exactness and scale arguments.
    */
  private[graft] def ksFromHistogram(hin: DataFrame): DataFrame = {
    val h = hin.localCheckpoint(false)
    val lg = h.select(col("lang")).distinct()
    val pr = lg.select(col("lang").as("la"))
      .join(lg.select(col("lang").as("lb")), col("la") < col("lb"))
    val ph = broadcast(pr).join(h, col("lang") === col("la"))
      .select(col("la"), col("lb"), col("v"), col("cnt").as("ca"),
        lit(0L).as("cb"))
      .union(broadcast(pr).join(h, col("lang") === col("lb"))
        .select(col("la"), col("lb"), col("v"), lit(0L).as("ca"),
          col("cnt").as("cb")))
      .groupBy(col("la"), col("lb"), col("v"))
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
      .localCheckpoint(false)
    val wCum = Window.partitionBy(col("la"), col("lb")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cu = ph
      .withColumn("cum_a", sum(col("ca")).over(wCum))
      .withColumn("cum_b", sum(col("cb")).over(wCum))
    val tot = ph.groupBy(col("la"), col("lb"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val d = cu.join(broadcast(tot), Seq("la", "lb"))
      .withColumn("dd",
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
    val mx = d.groupBy(col("la").as("mla"), col("lb").as("mlb"))
      .agg(max(col("dd")).as("ks_num"))
    d.join(broadcast(mx),
        col("la") === col("mla") && col("lb") === col("mlb")
          && col("dd") === col("ks_num"))
      .groupBy(col("la").as("lang_a"), col("lb").as("lang_b"), col("n_a"),
        col("n_b"), col("ks_num"))
      .agg(min(col("v")).as("ks_at_chars"))
      .select(col("lang_a"), col("lang_b"), col("n_a"), col("n_b"),
        col("ks_num"), col("ks_at_chars"),
        // ks_num can reach n_a·n_b (fully disjoint CDFs), so the 10⁶
        // scaling runs in DECIMAL(38,0) — Int64 would wrap (silently,
        // under Spark's non-ANSI arithmetic) once n_a·n_b > 9.2e12,
        // i.e. ~3M docs per language, while the DuckDB oracle (HUGEINT)
        // raises; 10⁶·ks_num ≤ 10⁶·n_a·n_b < 10²⁵ fits DECIMAL(38,0)
        // exactly wherever ks_num itself is exact. `div` on decimals is
        // exact floor division for the nonnegative operands here, so
        // both engines compute the identical BIGINT.
        expr("""CAST((CAST(ks_num AS DECIMAL(38,0)) * 1000000)
                div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)""")
          .as("ks_ppm"))
      .orderBy(col("lang_a"), col("lang_b"))
  }

  /** q334 — the STREAMING twin of q324: the per-(lang, length)
    * histogram maintained incrementally by [[graft.streaming
    * .DriftStream.step]] — here replayed as 4 doc_id-ordered batches
    * with one DUPLICATE delivery (the at-least-once shape; the doc_id
    * high-water mark makes the redelivered batch a no-op) — then the
    * identical KS ledger recomputed as a view over the maintained
    * state ([[ksFromHistogram]]). The oracle is q324's from-scratch SQL
    * verbatim: after any full replay the maintained histogram EQUALS
    * the from-scratch aggregation (sum composes under the mark), so
    * stream-shaped maintenance is hash-checked against batch truth —
    * the q314 pattern on the drift family.
    */
  val q334 = oracled(
    "q334_drift_stream_replay",
    "4-batch incremental histogram fold (with duplicate delivery) + KS view == from-scratch q324",
    q324.oracle.get) { (s, dir) =>
    import graft.streaming.DriftStream
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val span = docs.agg(min(col("doc_id")).as("mn"),
      max(col("doc_id")).as("mx"))
    val staged = docs.crossJoin(broadcast(span))
      .withColumn("bk", least(lit(3L),
        expr("(doc_id - mn) * 4 div (mx - mn + 1)")))
      .localCheckpoint() // four filtered scans below, one materialization
    var st = (DriftStream.emptyHist(s), DriftStream.emptyWm(s))
    for (k <- Seq(0, 1, 2, 2, 3)) // batch 2 redelivered: replay fixpoint
      st = DriftStream.step(st._1, st._2,
        staged.filter(col("bk") === k)
          .select(col("doc_id"), col("lang"), col("n_chars")))
    ksFromHistogram(st._1)
  }

  val all: Seq[GQuery] =
    Seq(q65, q66, q67, q68, q69, q70, q71, q72, q75, q82, q90, q91, q134,
      q135, q138, q145, q146, q148, q151, q155, q158, q160, q169, q181,
      q183, q191, q199, q210, q223, q236, q237, q238, q262, q268, q278,
      q296, q297, q301, q302, q310, q312, q324, q334)
}
