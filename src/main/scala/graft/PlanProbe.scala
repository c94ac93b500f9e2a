package graft
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq(graft.operators.Pipeline.q144, graft.operators.Analytics.q135)) {
      println(s"===== ${q.name} =====")
      println(q.run(spark, dir).queryExecution.executedPlan.toString.take(3500))
    }
    println("===== q143 rows =====")
    graft.operators.Pipeline.q143.run(spark, dir).show(10, false)
    spark.stop()
  }
}
