package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** The publish-side layout recipes as one API — what a pipeline calls
  * when a result table ships to a lake, encoding the layout decisions
  * the specs prove out individually (ScaleSpec: compaction bounds,
  * stats-based skipping; q111: z-order locality):
  *
  *  - partition columns prune whole directories at plan time;
  *  - range-clustering + in-file sort give every file a tight min/max
  *    span, so parquet stats skip row groups for range predicates;
  *  - `maxRecordsPerFile` bounds file sizes without a second job;
  *  - dynamic partition overwrite replaces exactly the partitions
  *    being re-published, leaving history intact.
  *
  * This is deliberately thin — every decision is a standard Spark
  * writer option; the value is pinning the COMBINATION that holds at
  * 100 TB (and that PublishSpec regression-tests).
  */
object Publish {

  /** Publish `df` to `path` partitioned by `partitionCols`, each
    * partition's files range-clustered and sorted on `clusterCols`.
    *
    * @param buckets           target file count per write (pre-split of
    *                          the cluster-key space)
    * @param maxRecordsPerFile hard per-file row bound (0 = unbounded)
    * @param overwritePartitions true = dynamic partition overwrite
    *                          (only written partitions replaced)
    */
  def publishPartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      clusterCols: Seq[String],
      buckets: Int = 8,
      maxRecordsPerFile: Long = 5000000L,
      overwritePartitions: Boolean = false): Unit = {
    val rangeCols: Seq[Column] = (partitionCols ++ clusterCols).map(col)
    val sortCols: Seq[Column] = rangeCols
    val writer = df
      .repartitionByRange(buckets, rangeCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    val partitioned =
      if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer
    val finalWriter =
      if (overwritePartitions)
        partitioned.option("partitionOverwriteMode", "dynamic")
      else partitioned
    finalWriter.parquet(path)
  }
}
