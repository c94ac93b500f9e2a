package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import graft.operators.{Dedup, Graph}

/** STREAMING pair-free near-dup clustering — the incremental twin of
  * batch q255's star contraction (VERDICT r10 #5), i.e. the production
  * shape of corpus dedup: cluster labels are a maintained ARTIFACT and
  * each arriving micro-batch updates them with delta-sized work, never
  * re-clustering the corpus.
  *
  * Per micro-batch ([[step]] — a PURE (labels, hubs, batch) →
  * (labels', hubs') function shared verbatim by the batch replay query
  * q256, so stream == batch is equality of the same fold):
  *
  *   1. MinHash the batch with the SAME construction as q45/q255
  *      ([[Dedup.minhashSignatures]] — bit-identical signatures),
  *      group by full signature (gid = min doc_id in batch).
  *   2. Emit q255's LINEAR star edges for the delta: doc → gid within
  *      each batch signature group; per (band, sig) bucket, gid → the
  *      bucket's persisted HUB if the bucket was seen before, else
  *      gid → batch-bucket-min (which becomes the stored hub). Every
  *      doc that ever shares a bucket is connected through its hub —
  *      the same connectivity argument as q255, O(batch + sigs×bands)
  *      edges, never Σ bucket².
  *   3. CONTRACT both endpoints through the current labels (q251's
  *      delta-through-labels move: an old doc stands for its whole
  *      component) and run [[Graph.cc]] on the contraction — node set
  *      = batch docs + touched component labels, delta-sized.
  *   4. Relabel: old components remap through the contraction's
  *      min-label result, batch docs adopt theirs. Min-of-mins
  *      composes, so after any prefix of batches the labels EQUAL the
  *      from-scratch q255 answer on the union of arrived docs
  *      (ClusterStreamSpec asserts it per batch, plus restart).
  *
  * State: `labelsDir` (doc_id, cluster) and `hubDir` (band, sig, rep)
  * as parquet, rewritten per batch via localCheckpoint-then-overwrite
  * (the read side is materialized before the path is truncated). At
  * 100 TB both stores are the bounded artifacts of the batch family —
  * labels are 2 longs/doc, hubs one row per distinct (band, sig) —
  * and a production deployment swaps the overwrite for a keyed MERGE.
  *
  * Delivery note (the [[NearDupStream]] caveat): `foreachBatch` is
  * at-least-once on retry; [[step]] re-applied to already-updated
  * state is a fixpoint (all delta edges contract to self-loops and
  * drop; the batch-doc anti-join below keeps labels row-unique), but
  * the two-store write pair is not transactional — exactly-once needs
  * both writes behind one committed MERGE. The spec exercises clean
  * runs and a checkpoint-boundary restart.
  */
object ClusterStream {

  private val labelsSchema =
    new StructType().add("doc_id", LongType).add("cluster", LongType)
  private val hubsSchema = new StructType()
    .add("band", IntegerType).add("sig", StringType).add("rep", LongType)

  /** Empty initial states for a from-nothing fold (batch q256). */
  private[graft] def emptyLabels(s: org.apache.spark.sql.SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], labelsSchema)
  private[graft] def emptyHubs(s: org.apache.spark.sql.SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], hubsSchema)

  /** One incremental update. labels: (doc_id, cluster); hubs:
    * (band, sig, rep); batch: the `documents` shape. Returns the
    * updated (labels, hubs) — both fully materialized frames.
    */
  private[graft] def step(labels: DataFrame, hubs: DataFrame,
      batch: DataFrame): (DataFrame, DataFrame) = {
    val rawSigs = Dedup.minhashSignatures(Dedup.tokensOf(batch))
    // groupBy+join rep labeling (same shape as Dedup.labeledSignatures:
    // the signature key is low-cardinality, so an aggregate window over
    // it would be one task per signature group on a large replay batch)
    val sigs = rawSigs
      .join(rawSigs.groupBy(col("mh")).agg(min(col("doc_id")).as("gid")),
        Seq("mh"))
      .localCheckpoint() // feeds stars, reps, and the relabel below
    val starWithin = sigs.filter(col("doc_id") =!= col("gid"))
      .select(col("doc_id").as("a"), col("gid").as("b"))
    val reps = Dedup.bandReps(sigs)
    // seen buckets: connect to the persisted hub; new buckets: star to
    // the batch-bucket-min, which becomes the stored hub.
    // r16 optimization (guide §2.4/§3): ONE left join against the hub
    // store instead of inner + anti + groupBy + join-back — the anti
    // join used to be COMPUTED TWICE (the newHubs branch and the toNew
    // branch each re-ran it: DataFrame branches don't share subtrees),
    // so one micro-batch paid 4 join executions against hubs; now it
    // pays one, checkpointed lazily (materialized by the first
    // consumer, reused by the rest). newHubs keeps the groupBy+join
    // shape, NOT a window over (band, sig) — the round-6 rule: a hot
    // bucket would serialize a window, while the aggregate stays
    // partial/map-side.
    val withHub = reps.join(hubs, Seq("band", "sig"), "left")
      .localCheckpoint(false)
    val newHubs = withHub.filter(col("rep").isNull)
      .groupBy(col("band"), col("sig"))
      .agg(min(col("gid")).as("rep"))
      .localCheckpoint(false)
    val toOld = withHub.filter(col("rep").isNotNull)
      .select(col("gid").as("a"), col("rep").as("b"))
    val toNew = withHub.filter(col("rep").isNull).drop("rep")
      .join(newHubs, Seq("band", "sig"))
      .filter(col("gid") =!= col("rep"))
      .select(col("gid").as("a"), col("rep").as("b"))
    val edges = starWithin.unionByName(toOld).unionByName(toNew).distinct()
    // q251 contraction: EVERY endpoint — including the batch docs
    // themselves — enters the component computation as its current
    // label (`start`). On first delivery a batch doc is absent from
    // `labels` and its start is its own id; on a duplicate delivery it
    // is its committed cluster, so all delta edges contract to
    // self-loops, every start is an isolated cc node mapping to
    // itself, and the state is a FIXPOINT (ClusterStreamSpec pins the
    // law — the first draft keyed the relabel on raw ids and a replay
    // silently reset the batch's labels).
    val lmap = labels.select(col("doc_id").as("n"), col("cluster").as("l"))
    val starts = sigs.select(col("doc_id"))
      .join(lmap.withColumnRenamed("n", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("l"), col("doc_id")).as("start"))
      .localCheckpoint(false) // lazy: first consumer materializes (r16)
    val contracted = edges
      .join(lmap.select(col("n").as("a"), col("l").as("la")), Seq("a"), "left")
      .join(lmap.select(col("n").as("b"), col("l").as("lb")), Seq("b"), "left")
      .select(coalesce(col("la"), col("a")).as("a"),
        coalesce(col("lb"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
    val nodes = starts.select(col("start").as("node"))
      .unionByName(contracted.select(col("a").as("node")))
      .unionByName(contracted.select(col("b").as("node")))
      .distinct()
    // lazy (r16): cc's last round is already a materialized RDD; this
    // checkpoint only pins the union-with-singletons, which the final
    // labels action materializes once for both consumers below
    val comp = Graph.cc(nodes, contracted).localCheckpoint(false)
    // relabel old components; batch docs adopt their start's component.
    // The anti-join keeps one row per doc under re-application.
    val remapOld = comp.select(col("node").as("cluster"), col("component"))
    val keptOld = labels
      .join(batch.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .join(remapOld, Seq("cluster"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("cluster")).as("cluster"))
    val newLabels = starts
      .join(comp.select(col("node").as("start"), col("component")),
        Seq("start"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("start")).as("cluster"))
    (keptOld.unionByName(newLabels).localCheckpoint(),
      hubs.unionByName(newHubs).localCheckpoint())
  }

  /** Start the streaming intake: cluster labels maintained at
    * `labelsDir`, bucket hubs at `hubDir`.
    *
    * @param docs streaming frame with (doc_id LONG, lang, source,
    *             text STRING) — the `documents` shape
    */
  def start(docs: DataFrame, labelsDir: String, hubDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, labelsDir, hubDir)
      }
      .start()

  private def readOr(s: org.apache.spark.sql.SparkSession, dir: String,
      schema: StructType): DataFrame = {
    // Hadoop FileSystem existence check — see IndexStream.readOr (a
    // java.io.File check silently treats HDFS/S3 state as empty)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) s.read.parquet(dir)
    else s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private[graft] def processBatch(batch: DataFrame, labelsDir: String,
      hubDir: String): Unit = {
    val s = batch.sparkSession
    val (labels2, hubs2) = step(
      readOr(s, labelsDir, labelsSchema), readOr(s, hubDir, hubsSchema),
      batch.localCheckpoint())
    // step localCheckpoints both outputs, so overwriting the paths they
    // were read from is safe
    labels2.write.mode(SaveMode.Overwrite).parquet(labelsDir)
    hubs2.write.mode(SaveMode.Overwrite).parquet(hubDir)
  }
}
