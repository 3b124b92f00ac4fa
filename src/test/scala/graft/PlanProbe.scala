package graft

/** Dev-only: print a query's final adaptive plan (`sbt "Test/runMain
  * graft.PlanProbe <query>"`) for plan-shape work; not part of CI.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "dd12_containment"
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    println(p.toString)
    spark.stop()
  }
}
