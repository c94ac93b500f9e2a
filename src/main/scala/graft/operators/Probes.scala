package graft.operators

import graft.GQuery
import graft.GQuery.oracled

/** TEMPORARY round-8 bisection probes (VERDICT_r07 "do this" #1).
  *
  * Four queries fail ONLY the driver's DuckDB hash check while passing
  * the bit-identical check against local DuckDB 1.0.0 at sf0.001/0.01/
  * 0.1 (judge-verified). The builder cannot reach the driver's DuckDB,
  * so these twins run each red query's COLUMN SUBSETS through the
  * driver's own per-query gate: whichever probe goes red in
  * CORRECTNESS_r08 names the value class (pure integers vs raw doubles
  * vs decimal sums) the driver's engine disagrees on; whichever stays
  * green is exonerated. Each probe is a trivial wrapper — same plan,
  * same oracle, projected — so a probe can only diverge where its
  * parent does.
  *
  * REMOVE after the r8 driver report lands (r9 cleanup), keeping the
  * conclusions in BUILDLOG.md.
  */
object Probes {

  private def subset(parent: GQuery, suffix: String, cols: Seq[String],
      order: String): GQuery =
    oracled(s"${parent.name.takeWhile(_ != '_')}$suffix",
      s"r8 bisection probe: ${cols.mkString(", ")} of ${parent.name}",
      s"SELECT ${cols.mkString(", ")} FROM (${parent.oracle.get}) ORDER BY $order") {
      (s, dir) =>
        parent.run(s, dir).select(cols.map(org.apache.spark.sql.functions.col): _*)
          .orderBy(order.split(",\\s*").map(org.apache.spark.sql.functions.col): _*)
    }

  // q74: (label, dim) keys + n are pure integers; the two mantissa-split
  // sums are DECIMAL(38,0) of exact 33-bit halves — isolate each.
  private val p74a = subset(Similarity.q74, "a_probe_n",
    Seq("label", "dim", "n"), "label, dim")
  private val p74b = subset(Similarity.q74, "b_probe_hi",
    Seq("label", "dim", "centroid_sum_hi"), "label, dim")
  private val p74c = subset(Similarity.q74, "c_probe_lo",
    Seq("label", "dim", "centroid_sum_lo"), "label, dim")

  // q167 (post-rewrite): n_lines + the new integer ppm vs the exact
  // DECIMAL(38,4) volume sum.
  private val p167a = subset(Relational.q167, "a_probe_ints",
    Seq("o_year", "n_lines", "mkt_share_ppm"), "o_year")
  private val p167b = subset(Relational.q167, "b_probe_volume",
    Seq("o_year", "volume"), "o_year")

  // q181: bucket/n_rows integers vs raw-double bounds vs the dec2 mass.
  private val p181a = subset(Analytics.q181, "a_probe_ints",
    Seq("bucket", "n_rows"), "bucket")
  private val p181b = subset(Analytics.q181, "b_probe_bounds",
    Seq("bucket", "lo", "hi"), "bucket")
  private val p181c = subset(Analytics.q181, "c_probe_mass",
    Seq("bucket", "price_mass"), "bucket")

  // q183 (post-rewrite): clip counts vs the integer thresholds
  // themselves vs the decimal mass.
  private val p183a = subset(Analytics.q183, "a_probe_counts",
    Seq("c_mktsegment", "n", "n_clipped_low", "n_clipped_high"),
    "c_mktsegment")
  private val p183b = oracled("q183b_probe_thresholds",
    "r8 bisection probe: the exact twentieth-cent winsorization thresholds",
    Analytics.winsorOracleCtes +
      """
       SELECT c_mktsegment, CAST(lo_x20 AS BIGINT) AS lo_x20,
         CAST(hi_x20 AS BIGINT) AS hi_x20
       FROM p ORDER BY c_mktsegment""") { (s, dir) =>
    import org.apache.spark.sql.functions.col
    Analytics.winsorThresholds(s, dir)
      .select(col("c_mktsegment"), col("lo_x20").cast("long").as("lo_x20"),
        col("hi_x20").cast("long").as("hi_x20"))
      .orderBy(col("c_mktsegment"))
  }
  private val p183c = subset(Analytics.q183, "c_probe_mass",
    Seq("c_mktsegment", "winsorized_mass"), "c_mktsegment")

  // Data-free decimal-representation discriminator. r8 analysis: the
  // ONLY queries in the r7 suite whose OUTPUT carries a decimal column
  // are exactly the four red ones (plus green q193, decimal(18,2) —
  // which is why this needs isolating). These are CONSTANTS — no scan,
  // no aggregation, no arithmetic beyond exact literal casts — with
  // values deliberately ABOVE 2^53 (9007199254740993 = 2^53 + 1) in
  // three widths: if the driver's DuckDB/pandas path renders any
  // decimal column through float64 (or formats it differently), this
  // probe fails with zero data involvement and convicts the
  // representation layer; if it stays green, the divergence is
  // data-dependent arithmetic and the column-subset probes above carry
  // the diagnosis.
  private val p74d = oracled("q74d_probe_decimal_repr",
    "r8 bisection probe: constant decimals (incl. 2^53+1) in the four output widths",
    """SELECT CAST(1 AS BIGINT) AS k,
         CAST(4100000000 AS DECIMAL(38,0)) AS c38_0_small,
         CAST(9007199254740993 AS DECIMAL(38,0)) AS c38_0_big,
         CAST(9007199254740993.11 AS DECIMAL(18,2)) AS c18_2_big,
         CAST(900719925474.0993 AS DECIMAL(38,4)) AS c38_4
       ORDER BY k""") { (s, dir) =>
    import org.apache.spark.sql.functions.{lit, expr}
    s.range(1).select(lit(1L).as("k"),
      expr("CAST(4100000000 AS DECIMAL(38,0))").as("c38_0_small"),
      expr("CAST(9007199254740993 AS DECIMAL(38,0))").as("c38_0_big"),
      expr("CAST(9007199254740993.11 AS DECIMAL(18,2))").as("c18_2_big"),
      expr("CAST(900719925474.0993 AS DECIMAL(38,4))").as("c38_4"))
      .orderBy("k")
  }

  val all: Seq[GQuery] = Seq(p74a, p74b, p74c, p167a, p167b,
    p181a, p181b, p181c, p183a, p183b, p183c, p74d)
}
