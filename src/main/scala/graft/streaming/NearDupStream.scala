package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructType}
import graft.operators.Dedup

/** Streaming NEAR-duplicate dedup — the incremental twin of the batch
  * SimHash family (q46/q47/q93), run per micro-batch via `foreachBatch`:
  *
  *   1. fingerprint the micro-batch with the SAME SimHash construction
  *      as batch q46 ([[Dedup.simhashOfTokens]] — bit-identical),
  *   2. pigeonhole-join it against the persisted fingerprint STORE
  *      (q93's delta × corpus shape: candidate volume scales with the
  *      batch, the corpus is never self-joined) and against
  *      earlier-arriving docs WITHIN the batch (`c.doc_id < d.doc_id`),
  *   3. append survivors to the output and ALL batch fingerprints to
  *      the store.
  *
  * Semantics (first-writer-wins): a doc is dropped iff any EARLIER doc
  * — prior batch, or smaller doc_id within its own batch — is within
  * Hamming ≤ 3. "Earlier" means any earlier arrival, surviving or not,
  * which makes the verdict a pure pair predicate; a stream fed in
  * doc_id order therefore emits exactly the batch twin q149's
  * survivor set (asserted in StreamingNearDupSpec).
  *
  * Why `foreachBatch` and not `dropDuplicatesWithinWatermark`: built-in
  * streaming dedup is EQUALITY on the key, and Hamming-≤-3 needs a
  * candidate JOIN (4 pigeonhole chunk keys per doc) plus a cross-bucket
  * verdict — per-micro-batch relational work against a persisted
  * artifact, which is exactly what `foreachBatch` is for. The store is
  * the production fingerprint table (2 longs per doc — ~16 GB per
  * billion docs): the same artifact q93's daily-crawl shape consumes.
  * [[CorpusStream.cleanIntake]] remains the watermarked-state path for
  * EXACT fingerprint dedup within a bounded horizon.
  *
  * Delivery note: `foreachBatch` is at-least-once on retry; the spec
  * exercises clean single runs. A production deployment makes step 3
  * idempotent (e.g. a MERGE keyed on doc_id, or batchId-partitioned
  * appends) — the dedup VERDICTS are unaffected either way, since
  * duplicate store rows produce the same pair set.
  */
object NearDupStream {

  private val storeSchema =
    new StructType().add("doc_id", LongType).add("simhash", LongType)

  /** Start the streaming intake: survivors (full input rows) append to
    * `outDir` as parquet, fingerprints accumulate in `storeDir`.
    *
    * @param docs streaming frame with (doc_id LONG, lang, source,
    *             text STRING) — the `documents` shape
    */
  def start(docs: DataFrame, storeDir: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, storeDir, outDir)
      }
      .start()

  /** One micro-batch: fingerprint, join vs store + earlier-in-batch,
    * append survivors and fingerprints. Also the unit the spec drives
    * directly for batch-boundary cases.
    */
  private[graft] def processBatch(batch: DataFrame, storeDir: String,
      outDir: String): Unit = {
    val s = batch.sparkSession
    // micro-batch fingerprints: bounded by the trigger, cut from the
    // streaming lineage so the two pigeonhole joins below don't
    // recompute the tokenize+aggregate per consumer
    val fps = Dedup.simhashOfTokens(Dedup.tokensOf(batch)).localCheckpoint()
    // Hadoop FileSystem existence check — see IndexStream.readOr (a
    // java.io.File check silently treats HDFS/S3 state as empty)
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val storeFs = storePath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val store =
      if (storeFs.exists(storePath)) s.read.parquet(storeDir)
      else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], storeSchema)
    val vsStore = Dedup.nearDupJoin(fps, store)
      .select(col("delta_doc").as("doc_id"))
    val vsBatch = Dedup.nearDupJoin(fps, fps, col("c.doc_id") < col("d.doc_id"))
      .select(col("delta_doc").as("doc_id"))
    val dropped = vsStore.union(vsBatch).distinct()
    batch.join(dropped, Seq("doc_id"), "left_anti")
      .write.mode(SaveMode.Append).parquet(outDir)
    fps.write.mode(SaveMode.Append).parquet(storeDir)
  }
}
