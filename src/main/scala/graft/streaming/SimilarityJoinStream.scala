package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType, StructType}
import graft.operators.{Dedup, TextOps}

/** Streaming twin of the unified similarity join (batch q322,
  * `TextOps`): per micro-batch, every new document is joined against
  * the COMMITTED corpus on both similarity legs — bigram-shingle
  * Jaccard ≥ [[TextOps.SimJoinJacT]] and frozen-dictionary TF-IDF
  * cosine ≥ [[TextOps.SimJoinCosT]] — and the qualifying pairs append
  * to one (metric, doc_a, doc_b, score) output relation, the exact
  * rows batch q322 produces when run over the arrived corpus.
  * Architecture is [[PassJoinStream]]'s: probe committed
  * posting/prefix stores with the batch's candidates, verify exactly,
  * append survivors and the batch's own index rows.
  *
  * Per micro-batch ([[processBatch]]):
  *
  *   1. dedupe delivery (in-batch on doc_id; cross-batch via left-anti
  *      against the committed Jaccard vector store — the seen set:
  *      every prior arrival has a row there, even shingle-less ones,
  *      so a REDELIVERED doc contributes nothing and re-emits nothing,
  *      IndexStream's idempotency),
  *   2. JACCARD leg: shingle the batch ([[Dedup.bigramShingleVecs]] —
  *      bit-equal with the batch operator), probe the committed
  *      posting store with each new doc's PREFIX under the fixed
  *      hash-ascending order (first n−⌈t·n⌉+1 shingles; the
  *      ONE-DIRECTIONAL completeness contract: J(A,B) ≥ t forces
  *      |A∩B| ≥ ⌈t·|A|⌉ > |A| − prefix, so A's prefix must hit B's
  *      full postings — any FIXED total order works, so the stream
  *      needs no corpus-wide document-frequency order), verify with
  *      the sorted-merge intersection; within-batch pairs come from
  *      the batch operator itself ([[Dedup.ngramJaccardPairs]]),
  *   3. COSINE leg: score the batch against the FROZEN IDF dictionary
  *      ([[TextOps.weightsFromDict]] — the same exact-integer
  *      arithmetic as the batch artifacts), probe the committed term
  *      posting store with each new doc's L2-prefix (keep terms while
  *      the normalized suffix norm ≥ τ, under the frozen (df, tid)
  *      order: if the prefix misses B entirely, every shared term
  *      lies in the suffix and cos ≤ ‖Â_suffix‖ < τ — the tailn half
  *      of q197 §2's bound, complete on its own), verify with the
  *      integer two-pointer dot; within-batch pairs come from
  *      [[TextOps.cosinePrefixPairs]],
  *   4. append the union to the output, and the batch's shingle
  *      vectors / shingle postings / term vectors / term postings to
  *      the four stores under `stateDir`.
  *
  * FROZEN-DICTIONARY CONTRACT: production retrieval does not
  * recompute IDF per event — the dictionary (tok, tid, df) and corpus
  * size are a periodically-rebuilt snapshot artifact
  * ([[TextOps.tfidfDict]]), and arrivals are scored against it.
  * Stream == batch is therefore EXACT when the stream replays the
  * corpus the dictionary was frozen from (SimilarityJoinStreamSpec),
  * and deliberately approximate on newer corpora (OOV tokens drop;
  * declared in [[TextOps.weightsFromDict]]).
  *
  * Pair-emission semantics: doc_ids arrive monotonically
  * (PassJoinStream's delivery contract), so a cross-batch pair is
  * always (committed, new) = (smaller, larger) — each qualifying pair
  * is emitted in EXACTLY the batch where its larger side arrives,
  * canonical (doc_a < doc_b), never re-emitted.
  *
  * Scale shape: per batch the corpus is touched only through the two
  * posting-store equi-joins (probe side is batch-sized; the stores
  * are scanned, never self-joined) and the two vector lookups for
  * verification — nothing pair-shaped is ever stored or shuffled
  * beyond the verified output itself. Duplicate-delivery and
  * multi-store append caveats are ClusterStream's, verbatim: the
  * five appends are not transactional; a crash between them can
  * leave a partially-committed batch for the checkpoint to replay.
  */
object SimilarityJoinStream {

  private val jacVecSchema = new StructType()
    .add("doc_id", LongType).add("lang", StringType)
    .add("source", StringType).add("sh", ArrayType(LongType))
    .add("n_sh", IntegerType)
  private val jacIdxSchema = new StructType()
    .add("doc_id", LongType).add("lang", StringType)
    .add("source", StringType).add("h", LongType)
  private val cosVecSchema = new StructType()
    .add("doc_id", LongType).add("lang", StringType)
    .add("source", StringType).add("ka", ArrayType(LongType))
    .add("wa", ArrayType(LongType)).add("n2", LongType)
  private val cosIdxSchema = new StructType()
    .add("doc_id", LongType).add("lang", StringType)
    .add("source", StringType).add("tid", LongType)

  /** The frozen scoring snapshot: the persisted IDF dictionary
    * artifact plus the corpus size it was frozen at.
    */
  def frozenDict(s: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, Long) =
    (TextOps.tfidfDict(s, dir), Dedup.tokenized(s, dir).count())

  /** Start the streaming intake. `docs`: streaming frame with (doc_id
    * LONG, lang, source, text) — the `documents` shape, delivered in
    * monotone doc_id order. The four stores live under `stateDir`;
    * qualifying pairs append to `outDir` as (metric, doc_a, doc_b,
    * score).
    */
  def start(docs: DataFrame, dict: DataFrame, nDocsFrozen: Long,
      stateDir: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, dict, nDocsFrozen, stateDir, outDir)
      }
      .start()

  private def readOr(s: org.apache.spark.sql.SparkSession, dir: String,
      schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) s.read.parquet(dir)
    else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** One micro-batch — also the unit the spec drives directly. */
  private[graft] def processBatch(batch0: DataFrame, dict: DataFrame,
      nDocsFrozen: Long, stateDir: String, outDir: String): Unit = {
    val s = batch0.sparkSession
    val (jacVecDir, jacIdxDir) = (s"$stateDir/jac_vecs", s"$stateDir/jac_idx")
    val (cosVecDir, cosIdxDir) = (s"$stateDir/cos_vecs", s"$stateDir/cos_idx")
    val jacT = TextOps.SimJoinJacT
    val cosT = TextOps.SimJoinCosT

    val jacVecStore = readOr(s, jacVecDir, jacVecSchema)
    // seen set = the committed Jaccard vector store (one row per prior
    // arrival, shingle-less docs included)
    val batch = batch0.dropDuplicates("doc_id")
      .join(jacVecStore.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val toks = Dedup.tokensOf(batch)

    // ---------------------------------------------------- jaccard leg
    val bg = Dedup.bigramShingleVecs(toks)
      .localCheckpoint() // probe, in-batch join, verify, store append
    val jacIdxStore = readOr(s, jacIdxDir, jacIdxSchema)
    // sh is hash-ascending (array_sort in the builder) — slicing its
    // head IS the prefix under the fixed order
    val prefJac = bg.select(col("doc_id"), col("lang"), col("source"),
      explode(slice(col("sh"), lit(1),
        (col("n_sh") - ceil(col("n_sh") * lit(jacT) - 1e-9) + 1)
          .cast("int"))).as("h"))
    val candJac = prefJac.alias("x")
      .join(jacIdxStore.alias("y"),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source")
          && col("x.h") === col("y.h"))
      .select(col("y.doc_id").as("doc_a"), col("x.doc_id").as("doc_b"))
      .distinct()
    import graft.functions.SortedIntersectCount.sortedIntersectCount
    val crossJac = candJac
      .join(jacVecStore.select(col("doc_id").as("doc_a"),
        col("sh").as("sh_a"), col("n_sh").as("n_a")).hint("merge"), "doc_a")
      .join(bg.select(col("doc_id").as("doc_b"),
        col("sh").as("sh_b"), col("n_sh").as("n_b")), "doc_b")
      .filter(col("n_a") + 1e-6 >= col("n_b") * lit(jacT)
        && col("n_b") + 1e-6 >= col("n_a") * lit(jacT))
      .withColumn("inter",
        sortedIntersectCount(col("sh_a"), col("sh_b")).cast("double"))
      .select(col("doc_a"), col("doc_b"),
        when(col("n_a") + col("n_b") - col("inter") > 0,
          col("inter") / (col("n_a") + col("n_b") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= jacT)
    val inBatchJac = Dedup.ngramJaccardPairs(toks, jacT)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val jacPairs = crossJac.unionByName(inBatchJac)

    // ----------------------------------------------------- cosine leg
    val nDocsF = s.range(1).select(lit(nDocsFrozen).as("n_docs"))
    val w = TextOps.weightsFromDict(TextOps.termFrequencies(toks), dict, nDocsF)
      .localCheckpoint()
    val vecs = TextOps.tfidfVecs(w)
    val cosIdxStore = readOr(s, cosIdxDir, cosIdxSchema)
    val cosVecStore = readOr(s, cosVecDir, cosVecSchema)
    // probe prefix: keep terms while the normalized SUFFIX norm can
    // still reach τ (tailn bound; see object scaladoc for the proof)
    val nw = w.join(vecs.select(col("doc_id"), col("n2")), "doc_id")
      .withColumn("nwt",
        col("wi").cast("double") / sqrt(col("n2").cast("double")))
    val tailW = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("tid"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prefCos = nw
      .withColumn("tailn", sqrt(sum(col("nwt") * col("nwt")).over(tailW)))
      .filter(col("tailn") >= lit(cosT) - 1e-9)
      .select(col("doc_id"), col("lang"), col("source"), col("tid"))
    val candCos = prefCos.alias("x")
      .join(cosIdxStore.alias("y"),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source")
          && col("x.tid") === col("y.tid"))
      .select(col("y.doc_id").as("doc_a"), col("x.doc_id").as("doc_b"))
      .distinct()
    import graft.functions.SortedDotLong.sortedDotLong
    val crossCos = candCos
      .join(cosVecStore.select(col("doc_id").as("doc_a"), col("ka").as("kaa"),
        col("wa").as("waa"), col("n2").as("na")).hint("merge"), "doc_a")
      .join(vecs.select(col("doc_id").as("doc_b"), col("ka").as("kab"),
        col("wa").as("wab"), col("n2").as("nb")), "doc_b")
      .withColumn("dot",
        sortedDotLong(col("kaa"), col("waa"), col("kab"), col("wab")))
      .select(col("doc_a"), col("doc_b"),
        (col("dot").cast("double")
          / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cosine"))
      .filter(col("cosine") >= cosT)
    val tauF = s.range(1).select(lit(cosT).as("tau"))
    val inBatchCos = TextOps.cosinePrefixPairs(w, vecs, tauF)
      .filter(col("cosine") >= cosT)
      .select(col("doc_a"), col("doc_b"), col("cosine"))
    val cosPairs = crossCos.unionByName(inBatchCos)

    // ------------------------------------------- emit + store appends
    jacPairs.select(lit("jaccard").as("metric"), col("doc_a"), col("doc_b"),
        col("jaccard").as("score"))
      .unionByName(cosPairs.select(lit("cosine").as("metric"), col("doc_a"),
        col("doc_b"), col("cosine").as("score")))
      .write.mode(SaveMode.Append).parquet(outDir)
    bg.write.mode(SaveMode.Append).parquet(jacVecDir)
    bg.select(col("doc_id"), col("lang"), col("source"),
        explode(col("sh")).as("h"))
      .write.mode(SaveMode.Append).parquet(jacIdxDir)
    vecs.write.mode(SaveMode.Append).parquet(cosVecDir)
    w.select(col("doc_id"), col("lang"), col("source"), col("tid"))
      .write.mode(SaveMode.Append).parquet(cosIdxDir)
  }
}
