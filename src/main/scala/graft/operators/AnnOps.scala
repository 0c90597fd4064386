package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Arithmetic contract: cosine is computed as a sequential left fold
  * in IEEE double (cast array<float> → array<double> first) — the
  * DuckDB twin (list_sum ∘ list_transform ∘ list_zip) folds in the
  * same order, and sqrt/divide are correctly rounded, so similarity
  * values are bit-identical across engines (verified empirically).
  *
  * Scale design: the query set is broadcast (small side); brute force
  * is map-side O(Q·N) — the exactness baseline. The LSH variant
  * prunes candidates to hyperplane-bucket collisions, turning the
  * cross product into a bucket join; recall is tunable via number of
  * hyperplane tables.
  */
object AnnOps {

  /** left-fold double dot product of two array<double> columns
    * (HOF reference formulation; the hot path uses [[cosine]]) */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** native single-pass cosine (bit-identical to the left-fold HOF
    * and the DuckDB oracle twin) */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExprs.cosine_sim(a, b)

  /** brute-force exact top-k cosine neighbors for each query vector */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"),
      col("embedding").cast("array<double>").as("qe"))
    val c = corpus.select(col("vec_id").as("nid"),
      col("embedding").cast("array<double>").as("ne"))
    val sims = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qe"), col("ne")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    sims.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** random-hyperplane signature: bit p = sign(Σ_d w_pd · v_d) with
    * deterministic pseudo-random ±1 weights from xxhash64(table, p, d).
    * One codegen'd pass per vector.
    */
  def hyperplaneSig(vec: Column, planes: Int, table: Int = 0): Column =
    transform(sequence(lit(0), lit(planes - 1)), p => {
      val s = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (v, d) =>
          when(xxhash64(concat(lit(table), lit("/"), p.cast("string"),
            lit(":"), d.cast("string"))) > 0, v).otherwise(-v)),
        lit(0.0), (acc, x) => acc + x)
      when(s > 0, lit(1)).otherwise(lit(0))
    })

  /** Multi-table LSH ANN: `tables` independent hyperplane tables of
    * `planes` bits; a candidate collides with the query in ≥1 table.
    * Exact cosine re-rank of the deduplicated candidate set, top-k.
    *
    * Recall of a neighbor at angle θ is 1−(1−(1−θ/π)^planes)^tables —
    * tune (planes, tables) to corpus size: more planes → smaller
    * buckets (less work), more tables → higher recall. At 1e9+ rows
    * use planes≈16–24 so bucket joins stay bounded.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, planes: Int, k: Int,
              tables: Int = 8): DataFrame = {
    def sig(df: DataFrame, idAs: String, embAs: String) = {
      val base = df.select(col("vec_id").as(idAs),
        col("embedding").cast("array<double>").as(embAs))
      base.select(col(idAs), col(embAs),
        explode(graft.functions.VectorExprs.hyperplane_buckets(
          col(embAs), tables, planes)).as("bucket"))
    }
    val q = sig(queries, "qid", "qe")
    val c = sig(corpus, "nid", "ne")
    val cand = c.join(broadcast(q), "bucket")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("qe"), col("ne"))
      .dropDuplicates("qid", "nid")
      .select(col("qid"), col("nid"), cosine(col("qe"), col("ne")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
