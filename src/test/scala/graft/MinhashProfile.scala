package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** scratch profiler: md5 oracle path vs xxh64 scale path, stage by
  * stage (not a spec) */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("32")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables(spark, dir, "documents")
    docs.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val shs = DedupOps.shinglesOfText(col("text"), 3)
    // signature-only cost (hash kernel isolated, no banding/shuffle)
    (1 to 2).foreach { i =>
      time(s"sig md5   only run$i")(
        docs.select(DedupOps.minhashSignatureMd5(shs, 32).as("sig"))
          .select(sum(size(col("sig")))).head())
      time(s"sig xxh64 only run$i")(
        docs.select(DedupOps.minhashSignature(shs, 32).as("sig"))
          .select(sum(size(col("sig")))).head())
    }
    // full pipelines
    (1 to 2).foreach { i =>
      time(s"full md5   run$i") {
        val sig = docs.select(col("doc_id"), DedupOps.minhashSignatureMd5(shs, 32).as("sig"))
        DedupOps.lshNearDupPairsMd5(sig, "doc_id", "sig", 8, 4, 0.5).count()
      }
      time(s"full xxh64 run$i") {
        val sig = docs.select(col("doc_id"), DedupOps.minhashSignature(shs, 32).as("sig"))
        DedupOps.lshNearDupPairs(sig, "doc_id", "sig", 8, 4, 0.5).count()
      }
    }
    spark.stop()
  }
}
