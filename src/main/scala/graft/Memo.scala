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

  private val locks = scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Per-key SYNCHRONIZED getOrElseUpdate: `TrieMap.getOrElseUpdate`
    * evaluates its thunk non-atomically, so two threads racing on a cold
    * memo would both run the expensive build (Spark jobs, eager
    * localCheckpoints) with one result leaked unreferenced. All memo
    * sites route through here: the winner builds under the key's lock,
    * the loser blocks and reads the cached value. (The lock map's own
    * getOrElseUpdate may construct a throwaway Object under race —
    * TrieMap's putIfAbsent semantics return the single winning lock to
    * every thread, which is all that matters.)
    */
  def sync[V](cache: scala.collection.concurrent.TrieMap[String, V],
      key: String)(build: => V): V =
    cache.get(key) match {
      case Some(v) => v
      case None =>
        locks.getOrElseUpdate(key, new Object).synchronized {
          cache.getOrElseUpdate(key, build)
        }
    }
}
