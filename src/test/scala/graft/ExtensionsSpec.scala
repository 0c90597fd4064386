package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL surface: the native expressions must be usable from spark.sql. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("registered SQL functions evaluate") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT size(word_shingles('a b c d', 3)) AS n_sh,
        |  size(minhash_signature(word_shingles('a b c d', 3), 16)) AS k,
        |  size(simhash_bits(array('a','b'))) AS bits,
        |  cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cs,
        |  size(hyperplane_buckets(array(0.1d, 0.2d), 4, 8)) AS tabs
        |""".stripMargin).head()
    assert(r.getAs[Int]("n_sh") == 2)
    assert(r.getAs[Int]("k") == 16)
    assert(r.getAs[Int]("bits") == 64)
    assert(r.getAs[Double]("cs") == 1.0)
    assert(r.getAs[Int]("tabs") == 4)
  }

  test("SQL minhash matches the Column API") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(50)
    docs.createOrReplaceTempView("docs_ext_spec")
    val viaSql = spark.sql(
      "SELECT doc_id, minhash_signature(word_shingles(text, 3), 8) AS sig FROM docs_ext_spec")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCol = docs.select(col("doc_id"),
        operators.DedupOps.minhashSignature(
          operators.DedupOps.shinglesOfText(col("text"), 3), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaCol)
  }
}
