package graft

/** scratch: dump formatted physical plans for PLANS.md exemplars
  * (not a spec — the JaccardProfile/HnswProfile discipline) */
object PlanDumpTool {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("8")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      println(s"===== $name =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
