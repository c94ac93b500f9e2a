package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import graft.operators.Dedup

/** Streaming edit-distance near-dup — the incremental twin of batch
  * q70 (PassJoin segment-pigeonhole, `Dedup.passJoinEditPairs`), run
  * per micro-batch via `foreachBatch`:
  *
  *   1. prefix the micro-batch (40-char `pfx`, the q70 construction),
  *   2. probe the COMMITTED segment index with the batch's PassJoin
  *      probe substrings ([[Dedup.passJoinProbe]] against
  *      [[Dedup.passJoinIndex]]-built store rows — the ONE-DIRECTIONAL
  *      completeness contract on the probe builder's scaladoc: any
  *      committed doc within edit distance ≤ k of a new doc shares an
  *      indexed segment with the new doc's probe set, so delta → index
  *      catches every qualifying (new, committed) pair without ever
  *      re-scanning the corpus),
  *   3. self-PassJoin the batch for earlier-arrival pairs WITHIN it,
  *   4. exact banded-DP verify on both candidate sets,
  *   5. append survivors to the output, and ALL batch docs to the two
  *      stores (segment index + prefix table).
  *
  * Semantics (first-writer-wins, NearDupStream's contract verbatim): a
  * doc is dropped iff any EARLIER doc — prior batch, or smaller doc_id
  * within its own batch — is within edit distance ≤ k on the 40-char
  * prefix in the same (lang, source) block. "Earlier" means any earlier
  * arrival, surviving or not, which makes the verdict a pure pair
  * predicate: a stream fed in doc_id order emits exactly the batch
  * survivor set derived from q70's oracled pair relation (asserted in
  * PassJoinStreamSpec).
  *
  * Scale shape: per batch, probe fan-out is the bounded explode chain
  * (≤ 2k+1 lengths × k+1 segments × ≤ k+1 offsets per NEW doc) and the
  * store join is a plain equi-join on (lang, source, l, i, sub) — the
  * corpus is touched only through index lookups, never self-joined.
  * The per-block length SET feeding the probe is re-aggregated from
  * the index store each batch (one distinct-values pass over store
  * keys; at production scale it would be a maintained ≤(blocks × 2k+1)
  * row artifact).
  *
  * Duplicate delivery: the batch is deduped on doc_id (IndexStream's
  * in-batch lesson), and a REDELIVERED doc probes its own committed
  * index rows at distance 0, so it is re-dropped rather than re-emitted
  * (the same self-match idempotency NearDupStream relies on).
  * `foreachBatch` is at-least-once on retry; the two-store append
  * non-transactionality caveat is ClusterStream's, verbatim.
  */
object PassJoinStream {

  /** Edit-distance threshold — q70's k. */
  private[graft] val K = 8

  private val docSchema = new StructType()
    .add("doc_id", LongType).add("lang", StringType)
    .add("source", StringType).add("pfx", StringType)
    .add("len", IntegerType)

  private val idxSchema = new StructType()
    .add("doc_id", LongType).add("lang", StringType)
    .add("source", StringType).add("l", IntegerType)
    .add("i", IntegerType).add("sub", StringType)

  /** Start the streaming intake: survivors (full input rows) append to
    * `outDir`, the segment index accumulates in `idxDir`, the prefix
    * table (the verify side) in `docDir`.
    *
    * @param docs streaming frame with (doc_id LONG, lang, source,
    *             text STRING) — the `documents` shape
    */
  def start(docs: DataFrame, idxDir: String, docDir: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, idxDir, docDir, outDir)
      }
      .start()

  private def readOr(s: org.apache.spark.sql.SparkSession, dir: String,
      schema: StructType): DataFrame = {
    // Hadoop FileSystem existence check — see IndexStream.readOr
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) s.read.parquet(dir)
    else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** One micro-batch: probe store + within-batch self-join, verify,
    * append survivors and index/prefix rows. Also the unit the spec
    * drives directly for batch-boundary cases.
    */
  private[graft] def processBatch(batch0: DataFrame, idxDir: String,
      docDir: String, outDir: String): Unit = {
    val s = batch0.sparkSession
    val batch = batch0.dropDuplicates("doc_id")
    val p = batch.select(col("doc_id"), col("lang"), col("source"),
        substring(col("text"), 1, 40).as("pfx"))
      .withColumn("len", length(col("pfx")))
      .localCheckpoint() // probe, self-join, verify, and both store appends
    val idxStore = readOr(s, idxDir, idxSchema)
    val docStore = readOr(s, docDir, docSchema)
    // committed lengths per block drive the probe enumeration
    val lens = idxStore.groupBy(col("lang"), col("source"))
      .agg(collect_set(col("l")).as("ls"))
    val candStore = Dedup.passJoinProbe(p, lens, K).alias("x")
      .join(idxStore.alias("y"),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source")
          && col("x.l") === col("y.l") && col("x.i") === col("y.i")
          && col("x.sub") === col("y.sub"))
      .select(col("x.doc_id").as("delta_doc"), col("y.doc_id").as("corpus_doc"))
      .distinct()
    val vsStore = candStore
      .join(p.select(col("doc_id").as("delta_doc"), col("pfx").as("pfx_a")),
        "delta_doc")
      .join(docStore.select(col("doc_id").as("corpus_doc"),
        col("pfx").as("pfx_b")), "corpus_doc")
      .filter(levenshtein(col("pfx_a"), col("pfx_b"), K).between(0, K))
      .select(col("delta_doc").as("doc_id"))
    // within-batch earlier arrivals: the full batch self-PassJoin;
    // pairs canonicalize (doc_a < doc_b), the later arrival drops
    val vsBatch = Dedup.passJoinEditPairs(
        p.select(col("doc_id"), col("lang"), col("source"), col("pfx")), K)
      .select(col("doc_b").as("doc_id"))
    val dropped = vsStore.union(vsBatch).distinct()
    batch.join(dropped, Seq("doc_id"), "left_anti")
      .write.mode(SaveMode.Append).parquet(outDir)
    Dedup.passJoinIndex(p, K).write.mode(SaveMode.Append).parquet(idxDir)
    p.write.mode(SaveMode.Append).parquet(docDir)
  }
}
