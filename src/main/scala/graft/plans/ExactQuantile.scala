package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT interpolated quantiles over integer-unit values, spelled out as
  * order-statistic arithmetic so no engine quantile function — and no
  * engine-version interpolation/float policy — is ever in the gate loop.
  * This generalizes the q183 winsorization template (r8's fix for the
  * rounds-6..8 driver reds, `Analytics.winsorThresholds`) into the one
  * shared implementation all quantile consumers use, on BOTH sides of
  * the gate: [[grouped]] builds the Spark plan and [[oracleCtes]] emits
  * the structurally-identical DuckDB CTE chain from the same
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
  * Distributed shape: ranks come from the two-level [[PrefixSum]]
  * ordinal (no single-task global window), per-group (n, rank targets)
  * ride a groups-sized broadcast, and only the ≤ 2·|quantiles| selected
  * order statistics per group survive the filter into a tiny pivot
  * aggregate — O(rows) scan + O(groups) state at any corpus size.
  */
object ExactQuantile {

  /** One requested quantile: output column `name` = quantile(num/den)
    * scaled ×den (exact BIGINT in `den × value-unit`).
    */
  final case class Q(name: String, num: Int, den: Int) {
    require(num >= 0 && den > 0 && num <= den, s"need 0 <= $num <= $den")
  }

  /** Per-group exact quantiles of BIGINT column `valueCol` in `df`.
    * Returns one row per group: `group` columns, `n` (group size,
    * BIGINT), and one ×den column per requested quantile. `group` may
    * be empty (global quantiles — a constant key feeds the ordinal;
    * the optimizer folds the constant out of the window partition
    * specs, so WindowExec logs a single-partition WARN for the OFFSETS
    * window — that window runs over the ≤ buckets-row subtotal relation
    * by design (q181 precedent); the data-bearing local window stays
    * partitioned by bucket).
    * `tiebreaks` only make the rank assignment deterministic; the
    * SELECTED VALUES are tiebreak-invariant (equal values are
    * interchangeable under any order statistic), which is why the
    * oracle side needs no tiebreak at all.
    */
  def grouped(
      df: DataFrame,
      group: Seq[String],
      valueCol: String,
      qs: Seq[Q],
      tiebreaks: Seq[Column] = Nil): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.map(_.name).distinct.size == qs.size, "duplicate quantile names")
    require(!df.columns.contains("n"), "input must not already have a column 'n'")
    val g0 = "__eq_g"
    val base = if (group.nonEmpty) df else df.withColumn(g0, lit(0))
    val gNames = if (group.nonEmpty) group else Seq(g0)
    val gCols = gNames.map(col)
    val ranked = PrefixSum.withRowNumber(base, "__eq_rn", gNames, valueCol, tiebreaks)
    var st = base.groupBy(gCols: _*).agg(count(lit(1)).as("n"))
    for (q <- qs) {
      val pos = expr(s"(${q.num}L * (n - 1)) div ${q.den}")
      st = st
        .withColumn(s"__${q.name}_ra", pos + 1)
        .withColumn(s"__${q.name}_rb", least(pos + 2, col("n")))
        .withColumn(s"__${q.name}_f", expr(s"(${q.num}L * (n - 1)) % ${q.den}"))
    }
    val wanted = qs
      .map(q => col("__eq_rn") === col(s"__${q.name}_ra") ||
        col("__eq_rn") === col(s"__${q.name}_rb"))
      .reduce(_ || _)
    val fCols = qs.map(q => col(s"__${q.name}_f"))
    val aggs = qs.flatMap(q => Seq(
      max(when(col("__eq_rn") === col(s"__${q.name}_ra"), col(valueCol)))
        .as(s"__${q.name}_va"),
      max(when(col("__eq_rn") === col(s"__${q.name}_rb"), col(valueCol)))
        .as(s"__${q.name}_vb")))
    val picked = ranked.join(broadcast(st), gNames)
      .filter(wanted)
      .groupBy((gCols :+ col("n")) ++ fCols: _*)
      .agg(aggs.head, aggs.tail: _*)
    val outs = qs.map(q =>
      (lit(q.den.toLong) * col(s"__${q.name}_va")
        + col(s"__${q.name}_f") * (col(s"__${q.name}_vb") - col(s"__${q.name}_va")))
        .as(q.name))
    picked.select((gCols :+ col("n")) ++ outs: _*).drop(g0)
  }

  /** The identical derivation as DuckDB CTE text (no leading `WITH`;
    * the caller splices it into its own chain). Reads a prior CTE
    * `src` with columns `group ++ (v BIGINT)`; defines `<prefix>q`
    * holding one row per group: the group columns, `n`, and the ×den
    * quantile columns — the exact mirror of [[grouped]]'s output.
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
