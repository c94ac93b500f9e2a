package graft

import org.apache.spark.sql.SparkSession

/** Cache-key discipline for per-dataset memos ([[ml.Recommender]]'s ALS
  * fit, [[operators.Dedup]]'s fingerprint/pair/cluster tables): keyed by
  * (SparkContext identity, data dir), so a restarted context in the same
  * JVM never receives another context's session-bound DataFrames or
  * models (localCheckpoint blocks die with their context). The fixture
  * dirs are immutable (TESTDATA.md: read-only), so no content-based
  * invalidation is needed; a pipeline over mutable inputs would key by
  * snapshot/version instead.
  */
object Memo {
  /** applicationId + startTime is unique per SparkContext for the life of
    * the JVM (identityHashCode is not: a GC'd context's hash can be
    * reused, which would serve dead localCheckpoint-backed artifacts to a
    * restarted context).
    */
  def key(s: SparkSession, dir: String): String = {
    val sc = s.sparkContext
    sc.applicationId + "-" + sc.startTime + ":" + dir
  }
}
