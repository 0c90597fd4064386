package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** scratch profiler for q_ngram_jaccard stages (not a spec) */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("32")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables(spark, dir, "documents")
    println(s"docs: ${docs.count()}")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sh = docs.select(col("doc_id"), DedupOps.shinglesOfText(col("text"), 3).as("shs"))
    // stage 1: shingle explode + postings groupBy
    val postings = sh.select(explode(col("shs")).as("s"),
        struct(col("doc_id").as("id"), size(col("shs")).as("sz")).as("m"))
      .select(xxhash64(col("s")).as("s"), col("m"))
      .groupBy(col("s")).agg(sort_array(collect_list(col("m"))).as("ms"))
      .filter(size(col("ms")) >= 2 && size(col("ms")) <= 50000)
    time("postings count")(println(postings.count()))

    val pairs = postings.select(explode(
      graft.functions.VectorExprs.pair_combinations(col("ms"))).as("p"))
    time("pairs explode count")(println(pairs.count()))

    time("full q_ngram_jaccard")(
      println(DedupOps.jaccardPairs(sh, "doc_id", "shs", 0.5).count()))
    (1 to 2).foreach(i =>
      time(s"full run $i")(
        println(DedupOps.jaccardPairs(sh, "doc_id", "shs", 0.5).count())))
    spark.stop()
  }
}
