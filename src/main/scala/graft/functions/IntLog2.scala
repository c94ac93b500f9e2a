package graft.functions

/** Exact-INTEGER piecewise-linear log2 — the shared transcendental-free
  * surrogate behind q245's exponential jitter and q250's bigram-LM
  * surprisal: for BIGINT n ≥ 1,
  *   bl = length(bin(n))               (binary digit count = octave)
  *   L2_x20(n) = (bl−1)·2²⁰ + ((n − 2^(bl−1))·2²⁰) div 2^(bl−1)
  * i.e. log2(n)·2²⁰ with the in-octave fraction linearly interpolated
  * between the octave endpoints. Pure integer arithmetic that Spark
  * and DuckDB evaluate IDENTICALLY (`bin`/`length` + shifts exist in
  * both), so log-scaled scores can cross the hash gate as BIGINTs.
  * Max error vs the real log2 is the chord bound
  * max |log2(x) − (x−1)| on [1,2] = 1/ln2 − 1 − log2(ln 2) ≈ 0.0861
  * (PipelineSpec pins it), plus < 2⁻²⁰ from the floor. Monotone
  * non-decreasing in n; exact at powers of two.
  */
object IntLog2 {

  /** Spark SQL fragment (for `expr`): L2_x20 of BIGINT expression
    * `col` (must be ≥ 1; callers guard).
    */
  def sparkSql(col: String): String =
    s"""((length(bin($col)) - 1) * 1048576
        + ($col - shiftleft(1L, cast(length(bin($col)) as int) - 1)) * 1048576
          div shiftleft(1L, cast(length(bin($col)) as int) - 1))"""

  /** DuckDB SQL fragment — the identical integer formula (`//` is
    * DuckDB's integer division, `<<` its shift).
    */
  def duckSql(col: String): String =
    s"""((length(bin($col)) - 1) * 1048576
        + ($col - (CAST(1 AS BIGINT) << (length(bin($col)) - 1))) * 1048576
          // (CAST(1 AS BIGINT) << (length(bin($col)) - 1)))"""
}
