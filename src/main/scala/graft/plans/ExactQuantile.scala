package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT interpolated quantiles over integer-unit values, spelled out as
  * order-statistic arithmetic so no engine quantile function — and no
  * engine-version interpolation/float policy — is ever in the gate loop.
  * This generalizes the q183 winsorization template (r8's fix for the
  * rounds-6..8 driver reds, `Analytics.winsorThresholds`) into the one
  * shared implementation all quantile consumers use, on BOTH sides of
  * the gate: [[grouped]] builds the Spark plan and [[oracleCtes]] emits
  * a DuckDB CTE chain computing the same definition from the same
  * (numerator, denominator) list, so the two engines cannot drift.
  *
  * Definition (the `quantile_cont`/`percentile` linear interpolation,
  * 1-based over each group's ordered values v_1..v_n): for p = num/den,
  *   pos = num·(n−1) div den,   f = num·(n−1) mod den,
  *   ra = pos+1,  rb = min(pos+2, n),
  *   q·den = den·v_ra + f·(v_rb − v_ra)            — an exact BIGINT.
  * The caller picks the integer unit (cents, micros) and receives the
  * quantile scaled ×den; one final division (if a human-facing number
  * is ever needed) stays OUTSIDE the gate columns.
  *
  * Distributed shape — q194's HISTOGRAM SELECTION, generalized to
  * groups, interpolated rank pairs, and RANGE-ADAPTIVE buckets (NOT a
  * full ranking: an order statistic needs 2 rows per quantile, so
  * ranking every row — even with the two-level PrefixSum ordinal —
  * does O(rows) shuffle+sort work to answer an O(1)-row question):
  *   pass 0: per-group (min, max) bounds — pure arithmetic then gives
  *     every row its bucket b = (v − lo) div w with width
  *     w = (hi − lo) div [[Buckets]] + 1, so the histogram is ≤
  *     [[Buckets]]+1 counters per group REGARDLESS of the value
  *     domain (a fixed width dies on wide domains: micro-unit values
  *     spanning 10⁹ would make domain/4096 ≈ the row count — the
  *     PrefixSum bounds-pass trick, reused);
  *   pass 1: one partial-aggregated (group, bucket) histogram; group
  *     sizes n and per-bucket cumulative offsets re-aggregate from the
  *     BUCKET table, never from the data;
  *   target derivation: each quantile contributes rank targets ra/rb
  *     (a `stack` over the groups-sized n table); the winning bucket
  *     per target comes from joining targets to the bucket prefix —
  *     all bucket-table-sized work;
  *   pass 2: re-scan ONLY rows in winning buckets (bucket-pruned
  *     semi-join against a targets-sized broadcast), count by exact
  *     value, and pick each target's crossing value with a window over
  *     ≤ w distinct values per target.
  * Three scans of the input (bounds + histogram + winning buckets), no
  * total sort, no per-row rank, per-group state bounded by
  * [[Buckets]] + w, not the row count. Chained calls (q160's
  * median-of-absolute-deviations) cost 3 scans each; callers for whom
  * the source re-scan dominates (wide upstream joins) persist their
  * input frame — the helper does not cache behind the caller's back.
  *
  * `(v − lo) div w` is non-negative, so truncating and flooring
  * division agree and buckets are contiguous ordered value ranges.
  * Ties need no tiebreak column at all: order statistics are
  * tiebreak-invariant, and the crossing-value pick counts duplicates
  * in one hash-aggregate row. Caller contract: values are unit-scaled
  * measures (cents, micros) whose per-group range hi − lo does not
  * overflow Long — not adversarial full-range Longs.
  */
object ExactQuantile {

  /** Histogram resolution: pass-1 state is ≤ Buckets+1 counters per
    * group; pass-2 windows run over ≤ (range div Buckets)+1 distinct
    * values per target. 2¹³ keeps the bucket table broadcast-small at
    * any group count that can also afford the groups-sized broadcasts
    * (measured: 8192 vs 65536 shaves the bucket-table shuffles at
    * identical pass-2 bounds on unit-scaled domains).
    */
  val Buckets = 8192L

  /** One requested quantile: output column `name` = quantile(num/den)
    * scaled ×den (exact BIGINT in `den × value-unit`).
    */
  final case class Q(name: String, num: Int, den: Int) {
    require(num >= 0 && den > 0 && num <= den, s"need 0 <= $num <= $den")
  }

  /** Per-group exact quantiles of BIGINT column `valueCol` in `df`.
    * Returns one row per group: `group` columns, `n` (group size,
    * BIGINT), and one ×den column per requested quantile. `group` may
    * be empty (global quantiles — a constant key stands in; it folds
    * out of the window partition specs, whose inputs here are all
    * bucket-table-sized, the q194 precedent).
    */
  def grouped(
      df: DataFrame,
      group: Seq[String],
      valueCol: String,
      qs: Seq[Q]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.map(_.name).distinct.size == qs.size, "duplicate quantile names")
    require(!df.columns.contains("n"), "input must not already have a column 'n'")
    require(!df.columns.exists(_.startsWith("__eq_")),
      "input must not contain columns with the reserved __eq_ prefix " +
        "(the template's internal working columns)")
    val g0 = "__eq_g"
    val base = if (group.nonEmpty) df else df.withColumn(g0, lit(0))
    val gNames = if (group.nonEmpty) group else Seq(g0)
    val gCols = gNames.map(col)
    // pass 0: per-group bounds → range-adaptive bucket width. The two
    // SMALL artifacts (bounds: groups rows; histogram: ≤ Buckets+1 per
    // group) are localCheckpointed: they are each consumed by several
    // downstream branches, and without lineage truncation every
    // reference re-prints (and for uncached inputs re-executes) the
    // whole upstream subtree — the graph-loop discipline, applied to a
    // fan-out DAG.
    val bounds = base.groupBy(gCols: _*)
      .agg(min(col(valueCol)).as("__eq_lo"), max(col(valueCol)).as("__eq_hi"))
      .localCheckpoint()
    def bucketed = base.join(broadcast(bounds), gNames)
      .withColumn("__eq_w", expr(s"(__eq_hi - __eq_lo) div $Buckets + 1"))
      .withColumn("__eq_b", expr(s"($valueCol - __eq_lo) div __eq_w"))
    // pass 1: bounded bucket histogram; n and cumulative offsets are
    // re-aggregations of the bucket table (no extra data scan)
    val cnts = bucketed
      .groupBy((gCols :+ col("__eq_b")): _*)
      .agg(count(lit(1)).as("__eq_cnt"))
      .localCheckpoint()
    val wb = Window.partitionBy(gCols: _*).orderBy(col("__eq_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = cnts.withColumn("__eq_cb",
      coalesce(sum(col("__eq_cnt")).over(wb), lit(0L)))
    val ns = cnts.groupBy(gCols: _*).agg(sum(col("__eq_cnt")).as("n"))
    // rank targets: 2 per quantile (ra, rb) per group
    val pairs = qs.flatMap { q =>
      val pos = s"(${q.num}L * (n - 1)) div ${q.den}"
      Seq(s"'${q.name}__a', ($pos) + 1",
        s"'${q.name}__b', least(($pos) + 2, n)")
    }
    val targets = ns.select((gCols :+
      expr(s"stack(${pairs.size}, ${pairs.mkString(", ")})")
        .as(Seq("__eq_lbl", "__eq_k"))): _*)
    val win = targets.join(cum, gNames)
      .filter(col("__eq_cb") < col("__eq_k") &&
        col("__eq_k") <= col("__eq_cb") + col("__eq_cnt"))
      .select((gNames.map(g => col(g).as(s"__eq_t_$g")) ++
        Seq(col("__eq_lbl"), col("__eq_k"), col("__eq_b").as("__eq_tb"),
          col("__eq_cb"))): _*)
    // pass 2: bucket-pruned rescan; crossing pick over exact values
    val joined = bucketed.join(broadcast(win),
      gNames.map(g => col(g) === col(s"__eq_t_$g")).reduce(_ && _) &&
        col("__eq_b") === col("__eq_tb"))
    val wv = Window.partitionBy((gCols :+ col("__eq_lbl")): _*)
      .orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sel = joined
      .groupBy((gCols ++ Seq(col("__eq_lbl"), col("__eq_k"), col("__eq_cb"),
        col(valueCol))): _*)
      .agg(count(lit(1)).as("__eq_c2"))
      .withColumn("__eq_ce", col("__eq_cb") + sum(col("__eq_c2")).over(wv))
      .filter(col("__eq_ce") - col("__eq_c2") < col("__eq_k") &&
        col("__eq_k") <= col("__eq_ce"))
      .select((gCols ++ Seq(col("__eq_lbl"), col(valueCol).as("__eq_v"))): _*)
    // pivot the ≤ 2·|qs| selected order statistics per group, then
    // interpolate against the groups-sized n table
    val aggs = qs.flatMap(q => Seq(
      max(when(col("__eq_lbl") === s"${q.name}__a", col("__eq_v")))
        .as(s"__${q.name}_va"),
      max(when(col("__eq_lbl") === s"${q.name}__b", col("__eq_v")))
        .as(s"__${q.name}_vb")))
    val piv = sel.groupBy(gCols: _*).agg(aggs.head, aggs.tail: _*)
    val outs = qs.map { q =>
      val f = expr(s"(${q.num}L * (n - 1)) % ${q.den}")
      (lit(q.den.toLong) * col(s"__${q.name}_va")
        + f * (col(s"__${q.name}_vb") - col(s"__${q.name}_va")))
        .as(q.name)
    }
    piv.join(ns, gNames)
      .select((gCols :+ col("n")) ++ outs: _*).drop(g0)
  }

  /** The identical definition as DuckDB CTE text (no leading `WITH`;
    * the caller splices it into its own chain). Reads a prior CTE
    * `src` with columns `group ++ (v BIGINT)`; defines `<prefix>q`
    * holding one row per group: the group columns, `n`, and the ×den
    * quantile columns — the exact mirror of [[grouped]]'s output. The
    * oracle brute-forces the rank selection with `ROW_NUMBER` over a
    * full sort — affordable at fixture scale, which is the point (the
    * q194 asymmetry): the INTERPOLATION arithmetic is shared verbatim,
    * the rank-finding strategies are independent, so a selection bug
    * on either side breaks the hash gate.
    * `//` is DuckDB's integer division (Spark's `div`).
    */
  def oracleCtes(
      prefix: String,
      src: String,
      group: Seq[String],
      qs: Seq[Q]): String = {
    val g = group.mkString(", ")
    val gSel = if (group.isEmpty) "" else s"$g, "
    val gBy = if (group.isEmpty) "" else s" GROUP BY $g"
    val part = if (group.isEmpty) "" else s"PARTITION BY $g "
    val gJoin =
      if (group.isEmpty) "TRUE"
      else group.map(c => s"${prefix}r.$c = ${prefix}t.$c").mkString(" AND ")
    val gSelT = if (group.isEmpty) "" else group.map(c => s"${prefix}t.$c").mkString(", ") + ", "
    val ranks = qs.flatMap(q => Seq(
      s"(${q.num} * (n - 1)) // ${q.den} + 1 AS ${q.name}_ra",
      s"LEAST((${q.num} * (n - 1)) // ${q.den} + 2, n) AS ${q.name}_rb",
      s"(${q.num} * (n - 1)) % ${q.den} AS ${q.name}_f")).mkString(",\n           ")
    val rankSet = qs.flatMap(q => Seq(s"${q.name}_ra", s"${q.name}_rb")).mkString(", ")
    val fBy = qs.map(q => s"${q.name}_f").mkString(", ")
    val sels = qs.map(q =>
      s"""${q.den} * MAX(CASE WHEN rn = ${q.name}_ra THEN v END)
             + ${q.name}_f * (MAX(CASE WHEN rn = ${q.name}_rb THEN v END)
                              - MAX(CASE WHEN rn = ${q.name}_ra THEN v END)) AS ${q.name}""")
      .mkString(",\n           ")
    s"""${prefix}r AS (
         SELECT ${gSel}v,
           ROW_NUMBER() OVER (${part}ORDER BY v) AS rn
         FROM $src),
       ${prefix}n AS (SELECT ${gSel}COUNT(*) AS n FROM $src$gBy),
       ${prefix}t AS (
         SELECT ${gSel}n,
           $ranks
         FROM ${prefix}n),
       ${prefix}q AS (
         SELECT $gSelT${prefix}t.n,
           $sels
         FROM ${prefix}t JOIN ${prefix}r ON $gJoin AND rn IN ($rankSet)
         GROUP BY $gSelT${prefix}t.n, $fBy)"""
  }
}
