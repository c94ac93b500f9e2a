package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling probe for the q197 rework (not a test; run with
  * Test/runMain graft.Probe197 <sfDir>).
  */
object Probe197 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/bench_sf1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val (w, vecs) = timed("tfidfArtifacts")(operators.TextOps.tfidfArtifacts(s, dir))
    println("[probe] w rows: " + w.count() + ", vecs rows: " + vecs.count())
    timed("minhashSignatures")(println("[probe] sigs: " +
      operators.Dedup.minhashSignatures(operators.Dedup.tokenized(s, dir)).count()))
    timed("q197 full")(println("[probe] q197 rows: " +
      operators.TextOps.q197.run(s, dir).count()))
    s.stop()
  }
}
