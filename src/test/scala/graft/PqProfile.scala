package graft

import org.apache.spark.sql.functions._
import graft.operators.AnnOps

/** scratch profiler for q_ann_pq (not a spec) */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("32")
    val e = Tables(spark, "/root/testdata/sf0.1", "embeddings")
    e.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 3).foreach { i =>
      time(s"pqTopK run$i")(
        AnnOps.pqTopK(e.filter(col("vec_id") < 10), e, m = 2, ksub = 16,
          k = 10, rerank = 50).count())
    }
    spark.stop()
  }
}
