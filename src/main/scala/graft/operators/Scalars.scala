package graft.operators

import org.apache.spark.sql.functions._
import graft.GQuery
import graft.GQuery.oracled
import graft.sources.Tables
import graft.functions.GraftFunctions._

/** Scalar-function surface (SURVEY.md §2.2 "String / date / math / array /
  * map / JSON scalars"): the reference computes only split/parseInt/abs/
  * sqrt/clamp in Java loops (F1-F3); here the full built-in function
  * families run as codegen'd Catalyst expressions — no UDFs anywhere.
  *
  * Parity notes baked into the oracle SQL: transcendental funcs (ln/exp)
  * are rounded to 6dp (Java Math and libm are not both correctly-rounded);
  * sqrt/abs/floor/ceil are IEEE-exact so left raw; timestamps are emitted
  * as formatted strings to dodge timezone-encoding differences.
  */
object Scalars {

  /** q20 — string functions over the part dimension. */
  val q20 = oracled(
    "q20_string_funcs",
    "lower/upper/length/substr/replace/concat/lpad/trim + LIKE",
    """SELECT p_partkey,
       LOWER(p_name) AS name_lower,
       UPPER(p_brand) AS brand_upper,
       LENGTH(p_name) AS name_len,
       SUBSTR(p_type, 1, 5) AS type_prefix,
       REPLACE(p_name, ' ', '_') AS name_snake,
       p_brand || ':' || p_type AS brand_type,
       LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       TRIM(p_name) AS name_trim
       FROM part
       WHERE p_name LIKE '%a%' AND p_partkey < 100
       ORDER BY p_partkey""") { (s, dir) =>
    Tables.part(s, dir)
      .filter(col("p_name").like("%a%") && col("p_partkey") < 100)
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        upper(col("p_brand")).as("brand_upper"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
        trim(col("p_name")).as("name_trim"))
      .orderBy(col("p_partkey"))
  }

  /** q21 — date/time functions over the events stream table: truncation,
    * field extraction, formatted output. The reference discards its
    * timestamp column entirely (SURVEY.md §1.3); here time is first-class.
    */
  val q21 = oracled(
    "q21_date_funcs",
    "date_trunc + year/month/day extraction + per-day aggregation",
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       YEAR(MIN(ts)) AS y,
       MONTH(MIN(ts)) AS m,
       DAY(MIN(ts)) AS d,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM events
       GROUP BY 1
       ORDER BY 1""") { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(
        year(min(col("ts"))).cast("long").as("y"),
        month(min(col("ts"))).cast("long").as("m"),
        dayofmonth(min(col("ts"))).cast("long").as("d"),
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("day"))
  }

  /** q22 — math functions over lineitem measures. */
  val q22 = oracled(
    "q22_math_funcs",
    "abs/sqrt/ln/exp/ceil/floor/sign/greatest/least",
    """SELECT l_orderkey, l_linenumber,
       ABS(l_discount - 0.05) AS abs_disc,
       SQRT(l_quantity) AS sqrt_qty,
       ROUND(LN(l_extendedprice), 6) AS ln_price,
       ROUND(EXP(l_discount), 6) AS exp_disc,
       CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
       CAST(FLOOR(l_quantity / 10) AS BIGINT) AS qty_decile,
       CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       GREATEST(l_tax, l_discount) AS max_rate,
       LEAST(l_tax, l_discount) AS min_rate
       FROM lineitem
       WHERE l_orderkey < 200
       ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 200)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_disc"),
        sqrt(col("l_quantity")).as("sqrt_qty"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        round(exp(col("l_discount")), 6).as("exp_disc"),
        ceil(col("l_extendedprice") / 1000).as("price_k_ceil"),
        floor(col("l_quantity") / 10).as("qty_decile"),
        signum(col("l_discount") - 0.05).as("disc_sign"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** q23 — JSON extraction from the semi-structured events.props column
    * (get_json_object stays inside codegen; no UDF).
    */
  val q23 = oracled(
    "q23_json_extract",
    "get_json_object over a JSON string column + aggregation",
    """SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
       FROM events
       GROUP BY event_type
       ORDER BY event_type""") { (s, dir) =>
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(s, dir)
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** q24 — array (higher-order) functions over the 64-dim embedding
    * column: size, element access, sequential fold for the squared norm.
    * Spark's `aggregate` and DuckDB's `list_reduce` are both defined as
    * left-to-right folds, so double sums match bit-exactly.
    */
  val q24 = oracled(
    "q24_array_ops",
    "size/element_at/sort + aggregate() fold over ARRAY<FLOAT>",
    """SELECT vec_id,
       len(embedding) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_val,
       CAST(list_sort(embedding)[1] AS DOUBLE) AS min_val,
       list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) AS norm_sq
       FROM embeddings
       WHERE vec_id < 100
       ORDER BY vec_id""") { (s, dir) =>
    Tables.embeddings(s, dir)
      .filter(col("vec_id") < 100)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        element_at(sort_array(col("embedding")), 1).cast("double").as("min_val"),
        normSq(col("embedding")).as("norm_sq"))
      .orderBy(col("vec_id"))
  }

  /** q54 — range (theta) join: events banded by value against a small
    * in-memory band dimension. Planned as a broadcast nested-loop join —
    * the right physical choice when one side is a handful of rows; the
    * non-equi join surface the reference lacks (SURVEY.md §2.2 row 2).
    */
  val q54 = oracled(
    "q54_range_band_join",
    "non-equi (BETWEEN) join against a broadcast band dimension",
    """WITH bands(band, lo, hi) AS (
         VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 1000000.0))
       SELECT band,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM events JOIN bands ON value >= lo AND value < hi
       GROUP BY band
       ORDER BY band""") { (s, dir) =>
    import s.implicits._
    val bands = Seq(("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1000000.0))
      .toDF("band", "lo", "hi")
    Tables.events(s, dir)
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("band"))
  }

  /** q55 — semi-structured props as a real MAP type: from_json to
    * MAP<STRING,BIGINT>, map functions, explode of entries.
    */
  val q55 = oracled(
    "q55_json_map_ops",
    "from_json -> MAP column -> map_keys/values + entry explode",
    """SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(len(json_keys(props))) AS BIGINT) AS max_keys
       FROM events
       GROUP BY event_type
       ORDER BY event_type""") { (s, dir) =>
    val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType))
    Tables.events(s, dir)
      .select(col("event_type"), m.as("props_map"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(element_at(col("props_map"), "k").isNotNull, 1L).otherwise(0L)).as("n_with_k"),
        sum(element_at(col("props_map"), "k")).as("sum_k"),
        max(size(map_keys(col("props_map")))).cast("long").as("max_keys"))
      .orderBy(col("event_type"))
  }

  /** q80 — array predicate higher-order functions (exists / forall /
    * filter) over tokenized text: per-row lambdas, no shuffle, all
    * evaluated inline on the scan side. The oracle spells them with
    * list_filter cardinalities — the portable definition of both
    * quantifiers.
    */
  val q80 = oracled(
    "q80_array_predicates",
    "exists/forall/filter array lambdas over tokenized documents",
    """SELECT doc_id,
       CAST(len(list_filter(toks, t -> length(t) >= 6)) AS BIGINT) AS n_long_tokens,
       len(list_filter(toks, t -> t = 'spark')) > 0 AS has_spark,
       len(list_filter(toks, t -> length(t) <= 2)) = 0 AS no_tiny_tokens
       FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
       WHERE doc_id < 200
       ORDER BY doc_id""") { (s, dir) =>
    val toks = split(trim(col("text")), " ")
    Tables.documents(s, dir)
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        size(filter(toks, t => length(t) >= 6)).cast("long").as("n_long_tokens"),
        exists(toks, t => t === "spark").as("has_spark"),
        forall(toks, t => length(t) > 2).as("no_tiny_tokens"))
      .orderBy(col("doc_id"))
  }

  /** q81 — null-preserving flatten (`explode_outer`): each document's
    * 'spark'/'join' token occurrences become rows, but documents with NO
    * match survive as a single null-token row — the generator semantics
    * plain `explode` silently loses. Oracle: LEFT JOIN LATERAL unnest.
    */
  val q81 = oracled(
    "q81_explode_outer",
    "explode_outer keeps match-less parents as null rows",
    """SELECT d.doc_id, m.tok
       FROM (SELECT doc_id,
               list_filter(string_split(trim(text), ' '), t -> t IN ('spark', 'join')) AS ms
             FROM documents WHERE doc_id < 100) d
       LEFT JOIN LATERAL (SELECT unnest(ms) AS tok) m ON true
       ORDER BY doc_id, tok""") { (s, dir) =>
    val toks = split(trim(col("text")), " ")
    Tables.documents(s, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        filter(toks, t => t.isin("spark", "join")).as("ms"))
      .select(col("doc_id"), explode_outer(col("ms")).as("tok"))
      .orderBy(col("doc_id"), col("tok"))
  }

  /** q84 — VARIANT semi-structured ingestion (Spark 4): JSON parsed
    * once to the binary VARIANT encoding (`parse_json`), then fields
    * pulled with typed `variant_get` path access — the columnar-friendly
    * replacement for repeated string re-parsing that get_json_object
    * does per call; `try_variant_get` yields null (not a failure) on a
    * path/type miss. At 100 TB the parse cost is paid once at ingest
    * and every downstream access is a binary field read. The oracle is
    * the semantically-equal JSON path extraction.
    */
  val q84 = oracled(
    "q84_variant_semistructured",
    "parse_json VARIANT + typed variant_get access, per-type stats",
    """SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
       FROM events
       GROUP BY event_type
       ORDER BY event_type""") { (s, dir) =>
    val v = parse_json(col("props"))
    Tables.events(s, dir)
      .select(col("event_type"),
        variant_get(v, "$.k", "long").as("k"),
        try_variant_get(v, "$.missing", "string").as("missing"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        count_if(col("missing").isNull).as("n_missing"))
      .orderBy(col("event_type"))
  }

  /** q85 — collation-aware grouping (Spark 4): a mixed-case column
    * grouped under the UTF8_LCASE collation folds case INSIDE the
    * aggregate — no lower() materialization, and the same collation
    * drives joins/sorts/comparisons engine-wide. The oracle is the
    * explicit lower() grouping; the output key is normalized via
    * lower() so both engines print the same representative.
    *
    * TWO-LEVEL aggregation: collated grouping can't use codegen'd hash
    * aggregation (ICU comparisons force a SortAggregate), so paying ICU
    * per ROW is the wrong 100 TB shape. Level 1 groups by the raw binary
    * string — codegen'd hash agg with map-side partials, the cheap pass
    * over the full corpus; level 2 re-groups only the DISTINCT keys
    * under UTF8_LCASE. Semantically identical (collation grouping is a
    * coarsening of binary grouping), with ICU cost on |distinct keys|,
    * not |rows|.
    */
  val q85 = oracled(
    "q85_collated_grouping",
    "UTF8_LCASE collated group-by over a mixed-case column",
    """SELECT lower(mixed) AS type_norm, CAST(COUNT(*) AS BIGINT) AS n
       FROM (SELECT CASE WHEN p_partkey % 2 = 0 THEN lower(p_type) ELSE p_type END AS mixed
             FROM part)
       GROUP BY lower(mixed)
       ORDER BY type_norm""") { (s, dir) =>
    val mixed = when(col("p_partkey") % 2 === 0, lower(col("p_type")))
      .otherwise(col("p_type"))
    Tables.part(s, dir)
      .select(mixed.as("mixed_bin"))
      .groupBy(col("mixed_bin"))                       // codegen'd, binary keys
      .agg(count(lit(1)).as("n0"))
      .select(collate(col("mixed_bin"), "UTF8_LCASE").as("mixed"), col("n0"))
      .groupBy(col("mixed"))                           // ICU on distinct keys only
      .agg(sum(col("n0")).as("n"))
      .select(collate(lower(col("mixed")), "UTF8_BINARY").as("type_norm"), col("n"))
      .orderBy(col("type_norm"))
  }

  /** q127 — nested-struct surgery: build a two-level struct, ADD a
    * computed nested field with `withField` and REMOVE one with
    * `dropFields` — in-place schema evolution on nested columns without
    * exploding/rebuilding the struct (the operator a lakehouse needs
    * when a nested payload schema grows a field). The oracle rebuilds
    * the same values with struct_pack/struct_insert; exact-decimal
    * arithmetic keeps the computed field bit-identical.
    */
  val q127 = oracled(
    "q127_struct_surgery",
    "nested withField/dropFields schema evolution on a built struct",
    """WITH s AS (
         SELECT o_orderkey,
           struct_pack(status := o_orderstatus,
             money := struct_pack(total := CAST(o_totalprice AS DECIMAL(18,2)), cur := 'USD')) AS meta
         FROM orders WHERE o_orderkey % 97 = 0)
       SELECT o_orderkey, meta.status AS status,
         CAST(meta.money.total AS DOUBLE) AS total,
         struct_insert(meta.money,
           discounted := CAST(meta.money.total * CAST(0.9 AS DECIMAL(3,2)) AS DOUBLE)).discounted AS discounted
       FROM s ORDER BY o_orderkey""") { (s, dir) =>
    val meta = struct(
      col("o_orderstatus").as("status"),
      struct(dec2(col("o_totalprice")).as("total"), lit("USD").as("cur")).as("money"))
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"), meta.as("meta"))
      // evolve the nested schema: add money.discounted, drop money.cur
      .withColumn("meta2",
        col("meta")
          .withField("money.discounted",
            (col("meta.money.total") * lit(0.9).cast("decimal(3,2)")).cast("double"))
          .dropFields("money.cur"))
      .select(col("o_orderkey"),
        col("meta.status").as("status"),
        col("meta.money.total").cast("double").as("total"),
        col("meta2.money.discounted").as("discounted"))
      .orderBy(col("o_orderkey"))
  }

  /** q88 — error-safe (`try_`) arithmetic: Spark 4 runs ANSI mode by
    * default, where x/0 and overflow FAIL the job; `try_divide` /
    * `try_add` yield NULL instead — the per-expression opt-out a
    * pipeline needs for dirty data without disabling ANSI globally.
    * The oracle spells the same null semantics with CASE guards
    * (DuckDB's / already nulls on 0 only for NULLIF-style guards).
    */
  val q88 = oracled(
    "q88_try_arithmetic",
    "try_divide/try_add null-on-error vs ANSI failure semantics",
    """SELECT l_orderkey, l_linenumber,
       CASE WHEN (l_quantity - 10.0) <> 0.0
            THEN l_extendedprice / (l_quantity - 10.0) END AS price_per_excess,
       CASE WHEN l_quantity <> 0.0
            THEN l_extendedprice / l_quantity END AS unit_price
       FROM lineitem
       WHERE l_orderkey < 100
       ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_extendedprice"), col("l_quantity") - 10.0)
          .as("price_per_excess"),
        try_divide(col("l_extendedprice"), col("l_quantity")).as("unit_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** q89 — calendar arithmetic roundup: day diffs, month shifts,
    * month-end, week truncation, date construction — the temporal
    * scalar surface (the reference throws its timestamp column away;
    * SURVEY §1.3). All codegen'd scalar ops; month-shift end-of-month
    * clamping (Jan 31 + 1 month = Feb 28/29) agrees across engines.
    */
  val q89 = oracled(
    "q89_date_arithmetic",
    "datediff/add_months/last_day/trunc-week/make_date scalars",
    """SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS d,
       date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS days_since_2024,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3mo,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE) AS week_start,
       make_date(2030, CAST(month(o_orderdate) AS INT), 1) AS anniversary
       FROM orders
       WHERE o_orderkey < 200
       ORDER BY o_orderkey""") { (s, dir) =>
    val d = col("o_orderdate").cast("date")
    Tables.orders(s, dir)
      .filter(col("o_orderkey") < 200)
      .select(col("o_orderkey"),
        d.as("d"),
        datediff(d, to_date(lit("2024-01-01"))).cast("long").as("days_since_2024"),
        add_months(d, 3).as("plus_3mo"),
        last_day(d).as("month_end"),
        date_trunc("week", d).cast("date").as("week_start"),
        make_date(lit(2030), month(col("o_orderdate")), lit(1)).as("anniversary"))
      .orderBy(col("o_orderkey"))
  }

  /** q164 — NULL-semantics battery: the engine-difference minefield,
    * pinned through the gate. Nulls are derived deterministically
    * (negative balances → NULL) because the fixtures ship none. Covers:
    * aggregate null-skipping (COUNT(col) vs COUNT(*), MIN/MAX/AVG over
    * a column with nulls), GROUP BY folding nulls into one group, and —
    * the actual trap — sort placement: Spark's ASC default is NULLS
    * FIRST, DuckDB's is NULLS LAST, so the per-segment top-3 window
    * spells NULLS FIRST explicitly on BOTH engines. A query that
    * "works" while silently inheriting either default breaks the moment
    * it moves engines; this one documents the contract.
    */
  val q164 = oracled(
    "q164_null_semantics",
    "null-skipping aggregates + explicit NULLS FIRST ordering parity",
    """WITH c AS (SELECT c_custkey, c_mktsegment,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
         FROM customer),
       agg AS (SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(bal) AS BIGINT) AS n_nonnull,
           CAST(COUNT(*) - COUNT(bal) AS BIGINT) AS n_null,
           MIN(bal) AS min_bal, MAX(bal) AS max_bal,
           ROUND(AVG(bal), 6) AS avg_bal
         FROM c GROUP BY c_mktsegment),
       top3 AS (SELECT c_mktsegment, c_custkey,
           row_number() OVER (PARTITION BY c_mktsegment
             ORDER BY bal ASC NULLS FIRST, c_custkey) AS rn
         FROM c)
       SELECT a.c_mktsegment, a.n_rows, a.n_nonnull, a.n_null,
         a.min_bal, a.max_bal, a.avg_bal,
         CAST(t.rn AS BIGINT) AS rn, t.c_custkey AS nulls_first_key
       FROM agg a JOIN top3 t ON t.c_mktsegment = a.c_mktsegment
       WHERE t.rn <= 3
       ORDER BY a.c_mktsegment, rn""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val c = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")).as("bal"))
    val agg = c.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("bal")).as("n_nonnull"),
        (count(lit(1)) - count(col("bal"))).as("n_null"),
        min(col("bal")).as("min_bal"), max(col("bal")).as("max_bal"),
        round(avg(col("bal")), 6).as("avg_bal"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("bal").asc_nulls_first, col("c_custkey"))
    val top3 = c.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("rn"), col("c_custkey").as("nulls_first_key"))
    agg.join(top3, "c_mktsegment")
      .select(col("c_mktsegment"), col("n_rows"), col("n_nonnull"), col("n_null"),
        col("min_bal"), col("max_bal"), col("avg_bal"), col("rn"),
        col("nulls_first_key"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** Histogram bucket width (cents) for the two-scan exact selection.
    * Bounds BOTH passes: pass 1's state is <= domain/width counters,
    * pass 2's per-quantile window runs over <= width distinct values.
    */
  private val SelWidth = 4096L

  /** q194 — EXACT distributed quantile selection in two scans: the
    * k-th smallest element (k = ceil(p·n) for p50/p90) of the lineitem
    * price in cents, found by histogram narrowing — pass 1 aggregates a
    * bounded bucket histogram (domain/[[SelWidth]] counters,
    * partial-aggregable), the cumulative scan locates each quantile's
    * winning bucket as a 1-row-per-quantile broadcast artifact, pass 2
    * re-scans ONLY the winning buckets grouped by exact value and picks
    * the crossing element. This is the selection primitive an engine
    * needs when "exact percentile" meets 100 TB: a total sort is a
    * full-shuffle O(N log N), `percentile()` buffers whole groups, the
    * t-digest sketch (q58/q165) is approximate — two-scan narrowing is
    * exact with state bounded by the VALUE DOMAIN, not the row count
    * (both windows here run over bounded relations: the bucket table
    * and <= width distinct values per quantile). The oracle brute-forces
    * the same ranks with row_number over a full sort — affordable at
    * fixture scale, which is the point.
    */
  val q194 = oracled(
    "q194_exact_quantile_selection",
    "two-scan histogram-narrowed exact p50/p90 selection (bounded state, no total sort)",
    """WITH c AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
          FROM lineitem),
       n AS (SELECT COUNT(*) AS n FROM c),
       q AS (SELECT 'p50' AS quantile, (n + 1) // 2 AS k FROM n
             UNION ALL SELECT 'p90', (9 * n + 9) // 10 FROM n),
       r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c)
       SELECT q.quantile, CAST(q.k AS BIGINT) AS k,
         CAST(r.v AS BIGINT) AS value_cents
       FROM q JOIN r ON r.rn = q.k
       ORDER BY q.quantile""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val c = Tables.lineitem(s, dir)
      .select((dec2(col("l_extendedprice")) * 100).cast("long").as("v"))
    // pass 1: bounded bucket histogram + cumulative prefix (the window
    // input is <= domain/width rows — bounded, like q186's score groups)
    val histo = c.groupBy(expr(s"v div $SelWidth").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val wb = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)
    val cum = histo.withColumn("cum_before", coalesce(sum(col("cnt")).over(wb), lit(0L)))
    // the quantile targets ride the plan as a 2-row artifact
    val ks = c.agg(count(lit(1)).as("n"))
      .select(expr("stack(2, 'p50', (n + 1) div 2, 'p90', (9 * n + 9) div 10)")
        .as(Seq("quantile", "k")))
    val win = ks.join(cum,
        col("cum_before") < col("k") && col("k") <= col("cum_before") + col("cnt"))
      .select(col("quantile"), col("k"), col("b"), col("cum_before"))
    // pass 2: only the winning buckets survive the scan; group by exact
    // value so the per-quantile window is bounded by the bucket width
    val wv = Window.partitionBy(col("quantile")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c.join(broadcast(win), expr(s"v div $SelWidth") === col("b"))
      .groupBy(col("quantile"), col("k"), col("cum_before"), col("v"))
      .agg(count(lit(1)).as("c2"))
      .withColumn("cum_end", col("cum_before") + sum(col("c2")).over(wv))
      .filter(col("cum_end") - col("c2") < col("k") && col("k") <= col("cum_end"))
      .select(col("quantile"), col("k"), col("v").as("value_cents"))
      .orderBy(col("quantile"))
  }

  val all: Seq[GQuery] =
    Seq(q20, q21, q22, q23, q24, q54, q55, q80, q81, q84, q85, q88, q89,
      q127, q164, q194)
}
