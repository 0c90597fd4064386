package graft

/** Dev-loop timing harness for the optimization rounds: serially time
  * named queries (same `.count()` action and table warm-up as Bench,
  * so numbers are comparable to the bench's `isolated` map) without
  * paying for the whole 238-query suite each iteration.
  *
  * Run: sbt "runMain graft.QTime q_a q_b ..."   (or `all`)
  * Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench;
  *      SPARK_GRAFT_REPS (default 2) — per-query repetitions, the
  *      min is reported (min-of-k estimates machine speed, transient
  *      load only inflates).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    Tables.names.foreach(t => Tables(spark, sfDir, t).count())
    val names =
      if (args.isEmpty || args.sameElements(Array("all")))
        SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    val out = names.map { name =>
      val fn = SparkEntry.queries(name)
      val walls = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(name)
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val line = f"$name%-34s min ${walls.min}%7.3f s   " +
        walls.map(w => f"$w%.3f").mkString(" ")
      println(line)
      s""""$name":${walls.min}"""
    }
    println(out.mkString("{", ",", "}"))
    spark.stop()
  }
}
