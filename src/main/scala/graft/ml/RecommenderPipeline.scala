package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.clamp
import graft.sources.Tables

/** Drop-in replacement for the reference's `main()` flow
  * (SVDMovieLensSparkJava.java:165-182): load a headerless TSV training
  * split, train the factor model, score a TSV test split, write the
  * predictions TSV (TestingData format) and report count + MAE.
  *
  * A reference user switches by calling
  * `RecommenderPipeline.run(spark, "u.data", "u1.test", outDir)` — same
  * three inputs, same outputs, same metric — with training now MLlib ALS
  * (64 features, the reference's regularization K=0.015, fixed seed)
  * instead of 768M serial driver-side SGD updates, and scoring a
  * broadcast join instead of a hand-rolled closure lookup.
  */
object RecommenderPipeline {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  final case class Result(nPredictions: Long, mae: Double)

  /** One point of the training convergence curve: the reference printed
    * per-epoch `rmse_last - rmse` (SVDMovieLensSparkJava.java:393-397);
    * `delta` is that observable (NaN for the first iteration).
    */
  final case class IterationMetric(iter: Int, rmse: Double, delta: Double)

  /** Convergence telemetry for the ALS fit. MLlib ALS exposes no mid-fit
    * hook, but with a FIXED seed the fit is deterministic given (data,
    * params, blocks): the model fitted at `maxIter = i` IS the state
    * after i iterations of the same trajectory. Refitting at 1..maxIter
    * therefore reconstructs the exact per-epoch RMSE curve the
    * reference's training loop printed. Cost is maxIter small fits —
    * appropriate for a telemetry/diagnostic API at fixture scale; a
    * 100 TB pipeline would checkpoint factor matrices per iteration and
    * evaluate those instead (same observable, amortized cost).
    *
    * Returns the metric sequence and the final-iteration model (so the
    * caller can verify the curve's endpoint matches a production fit
    * with the same hyperparameters — RecommenderSpec ties it to q36).
    */
  def trainingCurve(spark: SparkSession, train: DataFrame,
      rank: Int = Recommender.Rank, regParam: Double = Recommender.RegParam,
      maxIter: Int = Recommender.MaxIter, seed: Long = Recommender.Seed,
      numBlocks: Int = Recommender.NumBlocks)
      : (Seq[IterationMetric], org.apache.spark.ml.recommendation.ALSModel) = {
    import org.apache.spark.ml.recommendation.{ALS, ALSModel}
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val t = train.cache()
    try {
      var prev = Double.NaN
      var lastModel: ALSModel = null
      val metrics = (1 to maxIter).map { i =>
        val m = new ALS()
          .setUserCol("user").setItemCol("item").setRatingCol("rating")
          .setRank(rank).setRegParam(regParam).setMaxIter(i).setSeed(seed)
          .setNumUserBlocks(numBlocks).setNumItemBlocks(numBlocks)
          .setColdStartStrategy("drop")
          .fit(t)
        val rmse = m.transform(t)
          .agg(sqrt(avg(pow(col("rating") - col("prediction"), 2)))).head().getDouble(0)
        val d = prev - rmse
        prev = rmse
        lastModel = m
        log.info(f"[als] iter $i%2d rmse $rmse%.6f delta $d%.6f") // the reference's printout shape
        IterationMetric(i, rmse, d)
      }
      (metrics, lastModel)
    } finally t.unpersist()
  }

  def run(spark: SparkSession, trainPath: String, testPath: String,
      outPath: String, rank: Int = 64, maxIter: Int = 10): Result = {
    import org.apache.spark.ml.recommendation.ALS

    // Entry point 1 — LoadHistory (:185-223): parallel TSV ingest. The
    // per-entity stats the reference collected to driver arrays stay
    // relational (q30/q31 shapes) and are not needed for ALS itself.
    val train = Tables.ratingsTsv(spark, trainPath)
      .select(col("user_id").as("user"), col("item_id").as("item"),
        col("rating").cast("float").as("rating"))
      .cache()

    // Entry point 2 — CalcFeatures (:409-449) replaced by ALS.fit:
    // the blocked alternating-least-squares epoch protocol is what the
    // dead spark_CalcFeatures path (:366-406) was reaching for.
    val model = new ALS()
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setRank(rank).setRegParam(0.015).setMaxIter(maxIter).setSeed(42L)
      .setColdStartStrategy("nan")
      .fit(train)

    // Entry point 3 — ProcessTest (:452-471): score the holdout, clamp
    // into [1,5] (F2), fall back to the global mean for cold-start pairs
    // (the reference would produce INIT-dot garbage there; NaN -> prior
    // is strictly saner), write TSV, report MAE.
    val globalMean = train.agg(avg(col("rating"))).head().getDouble(0)
    val test = Tables.ratingsTsv(spark, testPath)
      .select(col("user_id").as("user"), col("item_id").as("item"),
        col("rating").cast("float").as("rating"))
    val scored = model.transform(test)
      .withColumn("pred",
        clamp(coalesce(
          when(isnan(col("prediction")), lit(null)).otherwise(col("prediction")),
          lit(globalMean)), 1.0, 5.0))
      .select(col("user").as("user_id"), col("item").as("item_id"),
        col("rating"), col("pred"))
      .cache()

    Recommender.writePredictionsTsv(scored, outPath)

    val row = scored.agg(
      count(lit(1)).as("n"),
      avg(abs(col("rating") - col("pred"))).as("mae")).head()
    val result = Result(row.getLong(0), row.getDouble(1))
    log.info(s"Number of predictions: ${result.nPredictions}") // reference :470's printout shape
    log.info(f"Avg Abs(diff): ${result.mae}%.4f")
    result
  }

  /** CLI: runMain graft.ml.RecommenderPipeline <train.tsv> <test.tsv> <outDir> */
  def main(args: Array[String]): Unit = {
    val Array(trainPath, testPath, outPath) = args.take(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-recommender")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // no-op for the µs fixture; keeps a ns-encoded events file readable
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, trainPath, testPath, outPath)
    spark.stop()
  }
}
