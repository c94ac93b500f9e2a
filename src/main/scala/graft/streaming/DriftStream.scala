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
  * State: `histDir` (lang, v, cnt) and `wmDir` (wm_id) as parquet,
  * rewritten per batch via localCheckpoint-then-overwrite — the
  * histogram store is domain-bounded, the mark is one row; the
  * two-store-write non-transactionality caveat is ClusterStream's,
  * verbatim.
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
      .localCheckpoint()
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
    (merged.localCheckpoint(), wm2.localCheckpoint())
  }

  /** Start the streaming intake: the histogram maintained at `histDir`,
    * the high-water mark at `wmDir`. DELIVERY CONTRACT (data-loss mode,
    * stated per the r13 ADVICE): documents must arrive in monotone
    * doc_id order across batches — redeliveries may only replay an
    * already-committed prefix; violations are logged per batch (see
    * [[step]]) but the rows are not recoverable. Use [[IndexStream]]'s
    * seen-set design when the input is unordered.
    */
  def start(docs: DataFrame, histDir: String, wmDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, histDir, wmDir)
      }
      .start()

  private def readOr(s: org.apache.spark.sql.SparkSession, dir: String,
      schema: StructType): DataFrame = {
    // Hadoop FileSystem existence check — see IndexStream.readOr
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) s.read.parquet(dir)
    else s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private[graft] def processBatch(batch: DataFrame, histDir: String,
      wmDir: String): Unit = {
    val s = batch.sparkSession
    val (hist2, wm2) = step(
      readOr(s, histDir, histSchema), readOr(s, wmDir, wmSchema),
      batch.localCheckpoint())
    // step localCheckpoints both outputs, so overwriting the paths they
    // were read from is safe
    hist2.write.mode(SaveMode.Overwrite).parquet(histDir)
    wm2.write.mode(SaveMode.Overwrite).parquet(wmDir)
  }
}
