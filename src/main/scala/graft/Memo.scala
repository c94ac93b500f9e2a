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

  /** One ledger row per [[artifact]] materialization or reuse in this
    * JVM — the artifact-footprint lens (r15 VERDICT #6): a production
    * pipeline has to SEE what its artifact tier costs on disk, and a
    * write-time regression must be attributable to I/O (bytes grew)
    * vs compute (bytes flat, seconds grew). `buildWriteS` is the wall
    * clock of the fused compute-and-write job — Spark pipelines the
    * build into the parquet write, so the two are separable only by
    * materializing twice; `bytes`/`files` provide the I/O-vs-compute
    * attribution instead. `reused` marks a cross-run cache hit (a
    * complete artifact found on disk — the warm path costs a listing,
    * not a job).
    */
  final case class ArtifactLedgerRow(dataDir: String, name: String,
    files: Long, bytes: Long, buildWriteS: Double, reused: Boolean)

  private val ledgerRows =
    new java.util.concurrent.ConcurrentLinkedQueue[ArtifactLedgerRow]

  /** Snapshot of this JVM's artifact ledger, build order preserved. */
  def ledger: Seq[ArtifactLedgerRow] = {
    val it = ledgerRows.iterator(); val b = Seq.newBuilder[ArtifactLedgerRow]
    while (it.hasNext) b += it.next(); b.result()
  }

  /** Collision-proof path segment for a data dir: the sanitized name
    * keeps paths human-readable, the appended hex of the ORIGINAL
    * string makes the mapping injective — `replaceAll` alone sends
    * `/data/sf1` and `/data_sf1` to the same segment, under which one
    * corpus would silently serve the other's parquet (r15 ADVICE).
    */
  private[graft] def dirSegment(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9._-]", "_") + "-" +
      Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))

  private def artifactPath(dir: String, name: String): String =
    artifactRoot + "/" + dirSegment(dir) + "/" + name

  /** Completeness marker. Framework-OWNED (written by [[artifact]]
    * itself after the parquet job returns), not the committer's
    * `_SUCCESS`: `_SUCCESS` only appears when
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs` is on —
    * default locally, commonly disabled on object-store committers —
    * and keying reuse on it would make every JVM under a stable
    * artifact dir silently rebuild everything (r15 ADVICE).
    */
  private val OkMarker = "_GRAFT_OK"

  /** Single-writer lock sentinel, living BESIDE the artifact dir (the
    * Overwrite write clears the dir itself). Advisory cross-JVM
    * exclusion: the creator builds; a contender polls for [[OkMarker]]
    * and takes over only once the lock goes stale ([[lockStaleMs]] —
    * a crashed writer's lock must not wedge the tier forever).
    */
  private def lockPath(path: String) = new org.apache.hadoop.fs.Path(path + ".lock")

  /** Lock staleness horizon. Var (not val) so the stale-takeover path
    * is testable without a 10-minute wait; production tuning via
    * SPARK_GRAFT_ARTIFACT_LOCK_STALE_MS.
    */
  private[graft] var lockStaleMs: Long =
    sys.env.get("SPARK_GRAFT_ARTIFACT_LOCK_STALE_MS").map(_.toLong)
      .getOrElse(10L * 60 * 1000)

  /** True iff the artifact already exists on disk COMPLETE (its
    * [[OkMarker]] present) — lets a builder of SIBLING artifacts skip
    * an expensive shared step when all its outputs are present.
    */
  def artifactExists(s: SparkSession, dir: String, name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(artifactPath(dir, name) + "/" + OkMarker)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Parquet-backed table memo: on first use per (context, dir, name)
    * the frame is built and written (skipped when a complete artifact
    * is already on disk — cross-run reuse under a stable
    * SPARK_GRAFT_ARTIFACT_DIR), then ALWAYS served as a parquet scan of
    * the artifact. An interrupted write leaves no [[OkMarker]], so the
    * next caller rebuilds over it (mode Overwrite). Concurrent COLD
    * callers in one JVM serialize on [[sync]]; across JVMs the
    * advisory `.lock` file elects one builder and the rest wait for
    * the marker (stale locks are taken over). Every materialization
    * and every reuse appends a [[ArtifactLedgerRow]].
    */
  def artifact(s: SparkSession, dir: String, name: String)(
      build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sync(artifactFrames, key(s, dir) + "#" + name) {
      val path = buildProtocol(s, dir, name) { p =>
        // zstd by default: artifacts are write-once/read-many
        // (often cross-run under a stable dir), so footprint
        // beats write CPU — measured at sf3 on the 225 M-row
        // pair table: −40% bytes (560.6→337.6 MB) for +5.8%
        // build+write time, and the build is compute-dominated
        // anyway (BUILDLOG r16 codec A/B)
        build.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .option("compression",
            sys.env.getOrElse("SPARK_GRAFT_ARTIFACT_CODEC", "zstd"))
          .parquet(p)
      }
      s.read.parquet(path)
    }

  private val artifactLayoutPaths =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** LAYOUT artifact: like [[artifact]] but the builder owns the write
    * (directory partitioning, bucketing, custom sinks — anything
    * `build.write.parquet` can't express), and the memo's value is the
    * PATH, not a frame. Same lock/marker/ledger protocol; the writer
    * must fully materialize into the given path (SaveMode.Overwrite —
    * an interrupted write leaves no [[OkMarker]] and is rebuilt over).
    * This is how a physical-layout table (e.g. the ship-month-
    * partitioned fact of q214) joins the cross-run artifact tier: at
    * 100 TB the partitioned fact is laid down once and every run's
    * pruning-dependent queries scan it — rebuilding the layout per run
    * would dwarf the queries it exists to accelerate.
    */
  def artifactLayout(s: SparkSession, dir: String, name: String)(
      write: String => Unit): String =
    sync(artifactLayoutPaths, key(s, dir) + "#" + name) {
      buildProtocol(s, dir, name)(write)
    }

  /** The shared build-once protocol: serve a complete on-disk artifact,
    * else elect one builder via the advisory `.lock` (stale locks
    * reclaimed), run `write` into the artifact path, stamp [[OkMarker]],
    * and ledger every materialization or reuse. Returns the path.
    */
  private def buildProtocol(s: SparkSession, dir: String, name: String)(
      write: String => Unit): String = {
    val path = artifactPath(dir, name)
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    def summarize(reused: Boolean, secs: Double): Unit = {
      val (nf, nb) =
        try { val cs = fs.getContentSummary(hp); (cs.getFileCount, cs.getLength) }
        catch { case _: java.io.IOException => (-1L, -1L) }
      ledgerRows.add(ArtifactLedgerRow(dir, name, nf, nb, secs, reused))
    }
    if (artifactExists(s, dir, name)) summarize(reused = true, 0.0)
    else {
      var built = false
      while (!built) {
        if (artifactExists(s, dir, name)) built = true // another JVM finished
        else {
          val acquired =
            try { fs.create(lockPath(path), false).close(); true }
            catch { case _: java.io.IOException => false }
          if (acquired)
            try {
              val t0 = System.nanoTime()
              write(path)
              fs.create(new org.apache.hadoop.fs.Path(
                path + "/" + OkMarker), true).close()
              summarize(reused = false, (System.nanoTime() - t0) / 1e9)
              built = true
            } finally fs.delete(lockPath(path), false)
          else {
            // a foreign writer holds the lock: wait for its marker,
            // or reclaim once the lock is stale (crashed writer)
            val st = try Some(fs.getFileStatus(lockPath(path)))
                     catch { case _: java.io.IOException => None }
            st match {
              case Some(l) if System.currentTimeMillis() - l.getModificationTime > lockStaleMs =>
                fs.delete(lockPath(path), false) // stale: reclaim and re-contend
              case Some(_) => Thread.sleep(200)
              case None => () // lock vanished between attempts: re-contend
            }
          }
        }
      }
      if (artifactExists(s, dir, name) && ledger.forall(r =>
        !(r.dataDir == dir && r.name == name))) summarize(reused = true, 0.0)
    }
    path
  }
  /** On-disk state of one artifact in the tier — the lifecycle view
    * behind `SHOW GRAFT ARTIFACTS` and retirement planning. Unlike
    * [[ledger]] (what THIS JVM built or reused), this is what the tier
    * holds RIGHT NOW, including incomplete wrecks (`complete = false`:
    * a crashed writer's partial data, rebuilt-over on next use) and
    * in-flight builds (`locked = true`).
    */
  final case class ArtifactDiskRow(dirSegment: String, name: String,
    files: Long, bytes: Long, complete: Boolean, locked: Boolean,
    modifiedMs: Long)

  /** Enumerate the artifact tier on disk: one row per
    * `<dirSegment>/<name>` directory under [[artifactRoot]], sorted.
    * Empty when the root does not exist yet (no artifact built).
    */
  def diskState(conf: org.apache.hadoop.conf.Configuration): Seq[ArtifactDiskRow] = {
    val root = new org.apache.hadoop.fs.Path(artifactRoot)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toIndexedSeq.filter(_.isDirectory).flatMap { seg =>
      fs.listStatus(seg.getPath).toIndexedSeq.filter(_.isDirectory).map { st =>
        val p = st.getPath
        val (nf, nb) =
          try { val cs = fs.getContentSummary(p); (cs.getFileCount, cs.getLength) }
          catch { case _: java.io.IOException => (-1L, -1L) }
        ArtifactDiskRow(seg.getPath.getName, p.getName, nf, nb,
          complete = fs.exists(new org.apache.hadoop.fs.Path(p, OkMarker)),
          locked = fs.exists(lockPath(p.toString)),
          modifiedMs = st.getModificationTime)
      }
    }.sortBy(r => (r.dirSegment, r.name))
  }

  /** Retire ONE artifact: acquire its build lock (deletion must never
    * race a live foreign writer — same election as [[buildProtocol]],
    * stale locks reclaimed), delete the artifact directory, release the
    * lock, and evict this session's cached frame so a later
    * [[artifact]] call rebuilds. Returns false WITHOUT touching disk
    * when a live foreign writer holds the lock — retirement of an
    * artifact someone is building is a caller-level conflict, not a
    * race to win. Retirement is Scala-API-only BY DESIGN: under the
    * delegating-parser pattern a side-effecting statement would execute
    * at PARSE time (`EXPLAIN RETIRE ...` would delete data), so the SQL
    * surface stays read-only and deletion keeps an explicit call site.
    */
  def retireArtifact(s: SparkSession, dir: String, name: String): Boolean = {
    val path = artifactPath(dir, name)
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val lp = lockPath(path)
    var acquired = false
    var attempts = 0
    while (!acquired && attempts < 3) {
      attempts += 1
      acquired =
        try { fs.create(lp, false).close(); true }
        catch { case _: java.io.IOException => false }
      if (!acquired) {
        val st = try Some(fs.getFileStatus(lp))
                 catch { case _: java.io.IOException => None }
        st match {
          case Some(l) if System.currentTimeMillis() - l.getModificationTime > lockStaleMs =>
            fs.delete(lp, false) // stale crashed writer: reclaim and retry
          case Some(_) => return false // live foreign writer
          case None => () // lock vanished between attempts: retry
        }
      }
    }
    if (!acquired) return false
    try fs.delete(hp, true) finally fs.delete(lp, false)
    artifactFrames.remove(key(s, dir) + "#" + name)
    artifactLayoutPaths.remove(key(s, dir) + "#" + name)
    true
  }

  /** Retire a corpus' ENTIRE artifact subtree — the documented GC unit
    * of a stable-dir deployment (artifacts are keyed by (data dir,
    * name) and immutable once complete, so when a corpus snapshot is
    * retired its whole `<dirSegment>/` tree goes with it). Refuses
    * (false, disk untouched) if ANY artifact under the segment holds a
    * live build lock; stale locks do not block (they die with the
    * tree). Evicts this session's cached frames for the dir.
    */
  def retireCorpus(s: SparkSession, dir: String): Boolean = {
    val seg = new org.apache.hadoop.fs.Path(artifactRoot + "/" + dirSegment(dir))
    val fs = seg.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(seg)) {
      val liveLock = fs.listStatus(seg).exists { st =>
        st.getPath.getName.endsWith(".lock") &&
          System.currentTimeMillis() - st.getModificationTime <= lockStaleMs
      }
      if (liveLock) return false
      fs.delete(seg, true)
    }
    val prefix = key(s, dir) + "#"
    artifactFrames.keys.filter(_.startsWith(prefix)).foreach(artifactFrames.remove)
    artifactLayoutPaths.keys.filter(_.startsWith(prefix)).foreach(artifactLayoutPaths.remove)
    true
  }

  /** Sweep incomplete artifact WRECKS: directories without [[OkMarker]],
    * older than `olderThanMs`, holding no live build lock. A crashed
    * writer's partial data is already invisible to the protocol (the
    * next builder rebuilds over it, mode Overwrite) but holds disk
    * until someone happens to rebuild that exact artifact — a
    * stable-dir deployment sweeps on its own calendar instead. Each
    * candidate is deleted UNDER the builder's advisory lock (acquire,
    * re-check the marker — it may have appeared since the listing —
    * delete, release), so a sweep can never race a live build: a
    * builder that beat us to the lock keeps its wreck (and rebuilds
    * over it); a marker that appeared means the artifact completed and
    * is not touched. No cache eviction is needed: a frame is cached
    * only after a marker-complete build, and wrecks have no marker.
    * Returns the swept (dirSegment, name) pairs.
    */
  def sweepIncomplete(s: SparkSession, olderThanMs: Long = 0L): Seq[(String, String)] = {
    val conf = s.sparkContext.hadoopConfiguration
    val now = System.currentTimeMillis()
    diskState(conf)
      .filter(r => !r.complete && !r.locked && now - r.modifiedMs > olderThanMs)
      .flatMap { r =>
        val path = artifactRoot + "/" + r.dirSegment + "/" + r.name
        val hp = new org.apache.hadoop.fs.Path(path)
        val fs = hp.getFileSystem(conf)
        val lp = lockPath(path)
        val acquired =
          try { fs.create(lp, false).close(); true }
          catch { case _: java.io.IOException => false }
        if (!acquired) None // a builder appeared since the listing
        else try {
          if (fs.exists(new org.apache.hadoop.fs.Path(path + "/" + OkMarker))) None
          else { fs.delete(hp, true); Some((r.dirSegment, r.name)) }
        } finally fs.delete(lp, false)
      }
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
