package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** STREAMING drift-monitor state — the incremental twin of batch q324's
  * input: the per-(lang, doc-length) HISTOGRAM is a maintained artifact
  * updated with batch-sized work, and the pairwise KS drift ledger is a
  * VIEW over it ([[graft.operators.Analytics.ksFromHistogram]]) that any
  * consumer recomputes in DOMAIN-bounded time — the histogram is
  * |langs| × |length domain| rows at any corpus scale, so re-deriving
  * the KS statistics from the maintained state is never the expensive
  * part; folding the corpus into the histogram is, and that is what
  * this stream incrementalizes.
  *
  * Per micro-batch ([[step]] — a PURE (hist, wm, batch) → (hist', wm')
  * function shared verbatim by the batch replay query q334, so
  * stream == batch is equality of the same fold):
  *
  *   1. DEDUPE delivery by HIGH-WATER MARK on doc_id (the
  *      [[SeasonalStream]] O(1) degenerate of IndexStream's seen set):
  *      additive count state cannot absorb a redelivered row, but a
  *      document LOG has a total order — doc_id — and arrives
  *      monotonically under the same delivery contract. Rows at or
  *      below the mark are replays and contribute zero delta; the drop
  *      is LOGGED per batch, not silent (the r13-ADVICE observable
  *      data-loss guard, verbatim from SeasonalStream).
  *   2. Reduce fresh rows to the (lang, v) count delta (one partial-agg
  *      groupBy of batch-sized input).
  *   3. MERGE: union old histogram with the delta and re-aggregate —
  *      SUM composes, so after any prefix of batches the histogram
  *      EQUALS the from-scratch aggregation over arrived documents
  *      (DriftStreamSpec asserts it, plus restart and replay).
  *
  * State: ONE `stateDir` holding BOTH stores — the (lang, v, cnt)
  * histogram and the one-row high-water mark — committed ATOMICALLY
  * per batch: each batch writes a fresh `v<N>/hist` + `v<N>/wm`
  * version directory and then creates the zero-byte marker
  * `v<N>/_COMMITTED`; readers resolve the HIGHEST committed version.
  * A crash anywhere mid-batch leaves an unmarked version directory
  * that readers never see, so the stream replays the batch against
  * the last fully-committed (hist, wm) pair — no histogram can ever
  * advance without its mark (silent double-count) and no mark without
  * its histogram (silent loss): the two-store-write window that
  * ClusterStream/IndexStream/SeasonalStream document as a caveat is
  * CLOSED here (marker-file creation is the single atomic commit
  * point; versions more than one below the commit are
  * garbage-collected after each commit — the immediately-previous
  * version is retained so reader frames survive one concurrent
  * commit, see [[readHist]]). The histogram store is domain-bounded,
  * the
  * mark is one row, so the per-batch rewrite is O(domain), not
  * O(corpus).
  */
object DriftStream {

  private val histSchema = new StructType()
    .add("lang", StringType).add("v", LongType).add("cnt", LongType)
  private val wmSchema = new StructType().add("wm_id", LongType)

  /** Empty initial states for a from-nothing fold (batch q334). */
  private[graft] def emptyHist(s: org.apache.spark.sql.SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], histSchema)
  private[graft] def emptyWm(s: org.apache.spark.sql.SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], wmSchema)

  /** One incremental update. hist: (lang, v, cnt); wm: 0-or-1 row
    * (wm_id); batch: the `documents` shape (doc_id, lang, n_chars —
    * extra columns ignored). Returns the updated (hist, wm), both fully
    * materialized.
    */
  private[graft] def step(hist: DataFrame, wm: DataFrame,
      batch: DataFrame): (DataFrame, DataFrame) = {
    val w1 = wm.agg(max(col("wm_id")).as("wm_id"))
    val marked = batch.select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("v"))
      // in-batch duplicate delivery is invisible to the mark
      .dropDuplicates("doc_id")
      .crossJoin(broadcast(w1))
      .withColumn("is_fresh",
        col("wm_id").isNull || col("doc_id") > col("wm_id"))
      // lazy (r17): the data-loss-guard count right below is the
      // materializing action — the eager checkpoint was a second
      // driver barrier per batch for the same materialization
      .localCheckpoint(false)
    // observable data-loss guard (SeasonalStream's, verbatim): sound
    // only under monotone doc_id delivery — replays only
    val nDropped = marked.filter(!col("is_fresh")).count()
    if (nDropped > 0)
      System.err.println(s"[DriftStream] $nDropped row(s) at-or-below " +
        "the doc_id high-water mark dropped as replays (monotone doc_id " +
        "delivery contract; genuinely-new late rows would be LOST here)")
    val fresh = marked.filter(col("is_fresh"))
    val delta = fresh.groupBy(col("lang"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    val merged = hist.unionByName(delta)
      .groupBy(col("lang"), col("v"))
      .agg(sum(col("cnt")).as("cnt"))
    val wm2 = wm.select(col("wm_id"))
      .unionByName(fresh.select(col("doc_id").as("wm_id")))
      .agg(max(col("wm_id")).as("wm_id"))
      .filter(col("wm_id").isNotNull)
    // lazy (r17): the consumer's first action pins each output — the
    // next step's guard count (replay fold) or the versioned parquet
    // write (stream). Laziness is SAFE for the stream because
    // processBatch writes a FRESH v<N+1> directory and its GC never
    // deletes the v<N> it read — nothing is overwritten mid-read.
    (merged.localCheckpoint(false), wm2.localCheckpoint(false))
  }

  /** Start the streaming intake: both stores maintained atomically
    * under `stateDir` (see the class scaladoc's commit protocol).
    * DELIVERY CONTRACT (data-loss mode, stated per the r13 ADVICE):
    * documents must arrive in monotone doc_id order across batches —
    * redeliveries may only replay an already-committed prefix;
    * violations are logged per batch (see [[step]]) but the rows are
    * not recoverable. Use [[IndexStream]]'s seen-set design when the
    * input is unordered.
    */
  def start(docs: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, stateDir)
      }
      .start()

  /** `v<digits>` with a NON-EMPTY digit suffix — `forall(_.isDigit)`
    * alone is vacuously true on the empty string, so a stray directory
    * named exactly "v" would parse as "".toLong and crash both the
    * version resolve and the GC loop (r15 ADVICE).
    */
  private def isVersionDir(n: String): Boolean =
    n.length > 1 && n.startsWith("v") && n.drop(1).forall(_.isDigit)

  private def fsOf(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Highest committed version under `stateDir`, or -1 when none.
    * A version counts ONLY with its `_COMMITTED` marker — a crash
    * mid-batch leaves an unmarked `v<N>` that is invisible here (and
    * overwritten when the replayed batch claims the same N).
    */
  private[graft] def committedVersion(s: org.apache.spark.sql.SparkSession,
      stateDir: String): Long = {
    val fs = fsOf(s, stateDir)
    val root = new org.apache.hadoop.fs.Path(stateDir)
    if (!fs.exists(root)) -1L
    else fs.listStatus(root).iterator.map(_.getPath.getName)
      .filter(isVersionDir)
      .map(_.drop(1).toLong)
      .filter(v => fs.exists(
        new org.apache.hadoop.fs.Path(s"$stateDir/v$v/_COMMITTED")))
      .foldLeft(-1L)(math.max)
  }

  private def readVersioned(s: org.apache.spark.sql.SparkSession,
      stateDir: String, store: String, schema: StructType): DataFrame = {
    val v = committedVersion(s, stateDir)
    if (v < 0) s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else s.read.parquet(s"$stateDir/v$v/$store")
  }

  /** The committed histogram / mark — the read side of the atomic
    * store (what a monitoring consumer feeds to ksFromHistogram).
    * READ-VALIDITY WINDOW: the returned frame is a lazy parquet scan
    * pinned to the version committed at call time; the GC retains one
    * superseded version, so the frame stays resolvable across AT MOST
    * ONE subsequent batch commit — resolve (collect/write) promptly,
    * and never hold a frame across two commits. The internal
    * processBatch path is safe regardless: step() localCheckpoints its
    * inputs' derivatives before any write.
    */
  private[graft] def readHist(s: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame = readVersioned(s, stateDir, "hist", histSchema)
  private[graft] def readWm(s: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame = readVersioned(s, stateDir, "wm", wmSchema)

  private[graft] def processBatch(batch: DataFrame, stateDir: String): Unit = {
    val s = batch.sparkSession
    val prev = committedVersion(s, stateDir)
    val (hist2, wm2) = step(
      readHist(s, stateDir), readWm(s, stateDir), batch.localCheckpoint())
    // step's outputs are LAZY checkpoints (r17) — the parquet writes
    // below materialize them while reading from v<prev>, which this
    // cycle never deletes (fresh v<next> dir + one-version GC
    // retention), so there is no overwrite-while-reading window
    val next = prev + 1
    val fs = fsOf(s, stateDir)
    val vdir = s"$stateDir/v$next"
    // a leftover UNMARKED v<next> from a crashed attempt is discarded
    fs.delete(new org.apache.hadoop.fs.Path(vdir), true)
    hist2.write.mode(SaveMode.Overwrite).parquet(s"$vdir/hist")
    wm2.write.mode(SaveMode.Overwrite).parquet(s"$vdir/wm")
    // THE commit point: marker creation is all-or-nothing, and it
    // publishes hist and wm together
    fs.create(new org.apache.hadoop.fs.Path(s"$vdir/_COMMITTED"), false).close()
    // GC every version strictly below the PREVIOUS commit, keeping
    // v<next-1> alive one extra cycle: readHist/readWm hand out LAZY
    // frames pinned to the version current at call time, and a
    // monitoring consumer may resolve or hold such a frame across the
    // next batch commit — deleting its files mid-scan would throw
    // FileNotFoundException (r15 ADVICE). One-version retention makes
    // any frame obtained after commit N survive through commit N+1;
    // holding a frame across TWO commits remains undefined (documented
    // on readHist). Listed, not counted down — at most two live
    // versions plus whatever a crash-before-GC left, so O(1).
    fs.listStatus(new org.apache.hadoop.fs.Path(stateDir)).foreach { st =>
      val n = st.getPath.getName
      if (isVersionDir(n) && n.drop(1).toLong < next - 1)
        fs.delete(st.getPath, true)
    }
  }
}
