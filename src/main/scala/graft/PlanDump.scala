package graft

/** Writes `.explain("formatted")` output for named queries to files —
  * the plans/r18/<query>_{before,after}.txt optimization-round
  * deliverable.
  *
  * Run: sbt "runMain graft.PlanDump <outDir> <suffix> q_a q_b ..."
  * e.g. sbt "runMain graft.PlanDump plans/r18 before q_dedup_fused"
  * writes plans/r18/q_dedup_fused_before.txt. Uses sf0.001 (plan
  * shape is scale-independent; AQE refines exchanges at runtime).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
