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
  *
  * Two memo tiers:
  *
  *   - [[sync]] — an in-context value (a fitted model, a pair of frames
  *     with a DECLARED partitioning layout that parquet cannot carry).
  *     localCheckpoint-backed frames here live in the block manager and
  *     die with the context.
  *   - [[artifact]] — a TABLE memo persisted as PARQUET under
  *     [[artifactRoot]] and read back as a plain file scan. This is the
  *     production posture for the shared pipeline tables (tokenized
  *     corpus, fingerprints, near-dup pairs, CC labels, tf-idf
  *     postings): a 100 TB pipeline builds them once and every
  *     downstream stage — across RUNS, not just across queries — scans
  *     the artifact; and because the artifact is a file scan, holding
  *     it costs ZERO executor memory (the r14 finding: 339 queries'
  *     accumulated localCheckpoint blocks in one shared bench JVM
  *     distorted mid-suite timings up to 14×; a block-manager memo is a
  *     measurement liability as well as a scale one). Column pruning
  *     and predicate pushdown apply to artifact consumers for free.
  */
object Memo {

  /** Root directory for [[artifact]] parquet. Default: one fresh temp
    * dir PER JVM — each run builds its own artifacts (the bench's
    * memo-warmup phase keeps measuring the build, and the 7-vs-32-cpu
    * determinism proof keeps its independence). Point
    * SPARK_GRAFT_ARTIFACT_DIR at a stable path to persist artifacts
    * across runs (the production mode). Single-writer per artifact
    * path is assumed — concurrent WRITERS from separate JVMs need the
    * transactional table format a production lakehouse provides; the
    * _SUCCESS marker only makes a crashed single writer rebuild.
    */
  lazy val artifactRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_ARTIFACT_DIR",
      java.nio.file.Files.createTempDirectory("graft-artifacts").toString)

  private val artifactFrames =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.DataFrame]

  private def artifactPath(dir: String, name: String): String =
    artifactRoot + "/" + dir.replaceAll("[^A-Za-z0-9._-]", "_") + "/" + name

  /** True iff the artifact already exists on disk (complete, i.e. with
    * its _SUCCESS marker) — lets a builder of SIBLING artifacts skip an
    * expensive shared step when all its outputs are present.
    */
  def artifactExists(s: SparkSession, dir: String, name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(artifactPath(dir, name) + "/_SUCCESS")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Parquet-backed table memo: on first use per (context, dir, name)
    * the frame is built and written (skipped when a complete artifact
    * is already on disk — cross-run reuse under a stable
    * SPARK_GRAFT_ARTIFACT_DIR), then ALWAYS served as a parquet scan of
    * the artifact. An interrupted write leaves no _SUCCESS, so the next
    * caller rebuilds over it (mode Overwrite).
    */
  def artifact(s: SparkSession, dir: String, name: String)(
      build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sync(artifactFrames, key(s, dir) + "#" + name) {
      val path = artifactPath(dir, name)
      if (!artifactExists(s, dir, name))
        build.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
      s.read.parquet(path)
    }
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
