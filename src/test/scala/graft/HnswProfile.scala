package graft

import org.apache.spark.sql.functions._
import graft.operators.AnnOps

/** scratch profiler for the graph-ANN recall path (not a spec) */
object HnswProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("8")
    val sf = "/root/testdata/sf0.001"
    val e = Tables(spark, sf, "embeddings")
    println(s"corpus: ${e.count()} vectors")
    val q = e.filter(col("vec_id") < 10)
    val bf = AnnOps.bruteForceTopK(q, e, 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val centroids = AnnOps.ivfCentroids(e, 8, 1)
    val nodes = e.select(col("vec_id").as("nid"),
        col("embedding").cast("array<double>").as("ne"))
      .withColumn("cid", AnnOps.nearestCentroid(col("ne"), centroids))
    nodes.groupBy("cid").count().orderBy("cid").show(20)
    val adj = AnnOps.nswAdjacency(nodes, m = 8, planes = 4, tables = 8)
    println(s"adjacency rows: ${adj.count()} of ${e.count()} nodes")
    adj.select(avg(size(col("nbrs")))).show()

    // where do the true neighbors live relative to the probed cells?
    val cellOf = nodes.select(col("nid"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((np, hops, beam, ent, mm) <- Seq(
      (2, 4, 20, 4, 8), (2, 6, 20, 4, 8), (4, 4, 20, 4, 8),
      (4, 6, 20, 4, 8), (4, 4, 30, 8, 8), (4, 6, 30, 8, 12),
      (2, 5, 20, 6, 12), (4, 5, 24, 6, 12))) {
      val res = AnnOps.hnswTopK(q, e, c = 8, nprobe = np, m = mm,
        beam = beam, hops = hops, k = 10, entries = ent)
      val hn = res.select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = bf.count(hn.contains).toDouble / bf.size
      println(f"nprobe=$np hops=$hops beam=$beam ent=$ent m=$mm recall=$recall%.3f rows=${hn.size}")
    }
    // coverage diagnosis at nprobe=2: is the truth even in probed cells?
    val probes2 = q.select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qe"))
      .withColumn("sims", graft.functions.VectorExprs.cosine_table(
        col("qe"), centroids.toSeq))
      .select(col("qid"), col("sims")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).zipWithIndex
        .sortBy(-_._1).take(2).map(_._2).toSet).toMap
    val inCell = bf.count { case (qid, nid) => probes2(qid).contains(cellOf(nid)) }
    println(s"true neighbors inside the 2 probed cells: $inCell / ${bf.size}")
    spark.stop()
  }
}
