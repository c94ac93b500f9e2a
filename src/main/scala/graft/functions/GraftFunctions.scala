package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression library: every scalar the reference computes in Java
  * loops, re-expressed as codegen-friendly Catalyst expressions (no UDFs
  * on the hot path — SURVEY.md §2.1 F1-F3, A5, O4).
  */
object GraftFunctions {

  /** Global-mean prior and pseudo-count of the reference's Bayesian-
    * smoothed item mean (Movie.java:38-41: (3.23*25+RatingSum)/(25.0+RatingCount)).
    */
  val PseudoAvgPrior = 3.23
  val PseudoAvgCount = 25.0

  /** `PseudoAvg` from Movie.java:38-41 as a column expression. */
  def pseudoAvg(sum: Column, count: Column): Column =
    (lit(PseudoAvgPrior * PseudoAvgCount) + sum) / (lit(PseudoAvgCount) + count)

  /** Clamp into [lo, hi] — the reference's repeated
    * `if (sum>5) sum=5; if (sum<1) sum=1` (F2, e.g. SVDMovieLensSparkJava.java:505-510).
    */
  def clamp(c: Column, lo: Double, hi: Double): Column =
    least(greatest(c, lit(lo)), lit(hi))

  /** Exact decimal view of a 2-dp money/measure double column. All sums
    * of money go through this so Spark and the DuckDB oracle produce
    * bit-identical aggregates regardless of partial-agg addition order.
    */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Deterministic double: round after all exact math is done. */
  def r4(c: Column): Column = round(c.cast("double"), 4)
  def r6(c: Column): Column = round(c.cast("double"), 6)

  /** Squared L2 norm via a sequential HOF fold (kept for q24's oracle
    * parity with DuckDB's list_reduce; hot paths use the codegen'd
    * graft.functions.VecOps.dotF instead — HOF lambdas are interpreted).
    */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** Reference-fidelity scorer (O4, SVDMovieLensSparkJava.java:499-513):
    * start at 1.0, add u(f)*i(f) one feature at a time, clamping into
    * [1,5] after EVERY term (order-dependent, deliberately nonstandard —
    * kept out of the idiomatic scoring path). Expressed as an
    * `aggregate()` fold so it is still codegen'd.
    */
  def clampedFoldScore(userVec: Column, itemVec: Column): Column =
    aggregate(
      zip_with(userVec, itemVec, (a, b) => a.cast("double") * b.cast("double")),
      lit(1.0),
      (acc, term) => least(greatest(acc + term, lit(1.0)), lit(5.0)))
}
