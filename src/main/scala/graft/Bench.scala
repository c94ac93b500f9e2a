package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events fixture is TIMESTAMP(NANOS)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, executor threads) AND the bench sfDir's
    // parquet footers, so the first measured query doesn't absorb JVM +
    // filesystem init (~4-5s observed on the round-1 first query)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.sources.Tables.names.foreach { t =>
      try {
        // events needs the nanos-timestamp read conf its loader sets
        if (t == "events") graft.sources.Tables.events(spark, sfDir).count()
        else graft.sources.Tables(spark, sfDir, t).count()
      } catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // outside the timed window
      // NB: forcing System.gc() here was tried (round 3) and REJECTED:
      // it tightened run-to-run variance slightly but cost ~8% total —
      // full GCs evict JIT/code-cache state the next query then rebuilds
      name -> (if (ok) elapsed else -1.0) // -1 marks a failed query, visibly
    }
    // Keep the ONE output line compact enough for the driver's finite
    // stdout-tail window (round 1's ~2.9 KB full-precision/full-name
    // line failed to parse): 3-decimal values, and query keys shortened
    // to their unique qNN prefix (full names are in CORRECTNESS/PLANS)
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def shortName(k: String): String = k.takeWhile(_ != '_')
    val qs = results.map { case (k, v) => s"\"" + shortName(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    spark.stop()
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}
