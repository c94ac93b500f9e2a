package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch instrumentation main for the optimization round: times the
  * phases of one query in isolation (not part of the driver contract).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic work counters: jobs / stages / tasks / summed task time
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          if (sys.env.contains("GRAFT_STAGE_DEBUG")) {
            val si = e.stageInfo
            val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
            println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%3d wall=${ms}%5d ms  ${si.name.take(90)}")
          }
        }
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
        }
      })
    def t[A](label: String)(f: => A): A = {
      val (j0, s0, k0, m0) = (jobs.get, stages.get, tasks.get, taskMs.get)
      val t0 = System.nanoTime(); val r = f
      Thread.sleep(150) // let the listener bus drain
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d tasks=${tasks.get - k0}%5d taskTime=${(taskMs.get - m0) / 1e3}%8.2f s")
      r
    }
    // warm the session like Bench does
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    graft.sources.Tables.names.foreach { n =>
      try graft.sources.Tables(spark, dir, n).count() catch { case _: Throwable => () }
    }
    import graft.sources.Tables
    import org.apache.spark.sql.expressions.Window
    // ---- q263 phase decomposition ----
    for (rep <- 1 to 2) {
      val wu = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), (col("event_id") % 100).as("item"),
          unix_micros(col("ts")).as("us"), col("event_id"))
      val und = ev.withColumn("b", lead(col("item"), 1).over(wu))
        .withColumn("gap", lead(col("us"), 1).over(wu) - col("us"))
        .filter(col("b").isNotNull && col("item") =!= col("b") &&
          col("gap") <= 1800000000L)
        .select(least(col("item"), col("b")).as("ua"),
          greatest(col("item"), col("b")).as("ub"))
        .groupBy(col("ua"), col("ub")).agg(count(lit(1)).as("cnt"))
      t(s"rep$rep edge build") { und.write.format("noop").mode("overwrite").save() }
      val (edges, nodes) = graft.operators.Graph.coRatingGraph(spark, dir)
      t(s"rep$rep edges count") { println(s"[probe] EDGES=${edges.count()} NODES=${nodes.count()}") }
      val ccOut = t(s"rep$rep q246 cc only") {
        val c = graft.operators.Graph.cc(nodes.select(col("user_id")),
          edges.filter(col("src") < col("dst")).select(col("src"), col("dst")))
        c.write.format("noop").mode("overwrite").save()
        c
      }
      t(s"rep$rep q246 window+sort") {
        ccOut.withColumn("component_size",
            count(lit(1)).over(Window.partitionBy(col("component"))).cast("long"))
          .select(col("node").as("user_id"), col("component"), col("component_size"))
          .orderBy(col("user_id")).count()
      }
      t(s"rep$rep q188") {
        SparkEntry.queries("q188_hits")(spark, dir).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
