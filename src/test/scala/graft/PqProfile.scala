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
    // kernel A/B: corpus encode via the native NearestCodeL2 expression
    // (r4) vs the r3 inlined-HOF formulation (ksub interpreted
    // aggregate folds per subspace per row)
    import graft.functions.VectorExprs
    import org.apache.spark.sql.Column
    val base = e.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist()
    base.count()
    val dim = base.select(size(col("v"))).head().getInt(0)
    val m = 2; val ksub = 16; val subDim = dim / m
    def subCol(v: Column, s: Int): Column = slice(v, s * subDim + 1, subDim)
    val books: Array[Seq[Seq[Double]]] = Array.tabulate(m)(s =>
      (0 until ksub).map(c => (0 until subDim).map(d => math.sin(s * 1000 + c * 64 + d))))
    def l2sqHof(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)
    def nearestHof(sub: Column, book: Seq[Seq[Double]]): Column = {
      val dists = array(book.map(ct => l2sqHof(sub, typedLit(ct))): _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    (1 to 3).foreach { i =>
      time(s"encode native run$i")(base.select(
        array((0 until m).map(s =>
          VectorExprs.nearest_code_l2(subCol(col("v"), s), books(s))): _*).as("codes"))
        .agg(sum(element_at(col("codes"), 1))).head())
      time(s"encode HOF    run$i")(base.select(
        array((0 until m).map(s =>
          nearestHof(subCol(col("v"), s), books(s))): _*).as("codes"))
        .agg(sum(element_at(col("codes"), 1))).head())
    }
    base.unpersist()
    spark.stop()
  }
}
