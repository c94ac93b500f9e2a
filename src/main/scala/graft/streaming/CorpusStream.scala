package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.RollingHash.rollingHash
import graft.operators.TextOps

/** Streaming corpus intake — the incremental twin of the batch prep
  * pipeline: a crawl feed is quality-gated with the SAME composite
  * heuristic q41 oracles ([[TextOps.qualityScore]]) and near-dup-dropped
  * by content fingerprint within the watermark horizon, so a
  * continuously-arriving 100 TB crawl is cleaned on ingest instead of in
  * a nightly batch.
  *
  * State design: the only stateful operator is
  * `dropDuplicatesWithinWatermark` on the content fingerprint — seen-key
  * state expires as event time advances, so state is bounded by the
  * duplicate-arrival horizon (here 30 min), not corpus size. The quality
  * gate is stateless scan-local expression work.
  */
object CorpusStream {

  /** Quality-gate then fingerprint-dedup a watermarked document stream.
    *
    * @param docs streaming frame with (doc_id LONG, text STRING,
    *             ingest_ts TIMESTAMP)
    * @param minQuality drop docs scoring below this composite quality
    */
  def cleanIntake(docs: DataFrame, minQuality: Double): DataFrame =
    docs.withWatermark("ingest_ts", "30 minutes")
      .withColumn("quality", TextOps.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)
      .withColumn("fp", rollingHash(col("text")))
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("ingest_ts"), col("quality"), col("fp"))
}
