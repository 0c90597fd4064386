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

  test("native expressions codegen-compile (fallback disabled)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.fallback", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    GraftExtensions.register(s2)
    val r = s2.sql(
      """SELECT doc_id,
        |  minhash_signature(word_shingles(text, 3), 8) AS sig,
        |  simhash_bits(word_shingles(text, 1)) AS bits
        |FROM parquet.`/root/testdata/sf0.001/documents.parquet`
        |ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(r.length == 5 && r.head.getSeq[Long](1).size == 8)
    val c = s2.sql(
      """SELECT cosine_sim(CAST(a.embedding AS ARRAY<DOUBLE>), CAST(b.embedding AS ARRAY<DOUBLE>)) AS cs,
        |  hyperplane_buckets(CAST(a.embedding AS ARRAY<DOUBLE>), 4, 8) AS hb
        |FROM parquet.`/root/testdata/sf0.001/embeddings.parquet` a
        |JOIN parquet.`/root/testdata/sf0.001/embeddings.parquet` b ON b.vec_id = a.vec_id + 1
        |LIMIT 3""".stripMargin).collect()
    assert(c.length == 3 && c.head.getSeq[String](1).size == 4)
    // the md5-portable kernels take the same codegen path
    val m = s2.sql(
      """SELECT doc_id,
        |  minhash_signature_md5(word_shingles(text, 3), 8) AS sig,
        |  simhash_bits_md5(word_shingles(text, 1)) AS bits,
        |  simhash_bits_128(word_shingles(text, 1)) AS wide
        |FROM parquet.`/root/testdata/sf0.001/documents.parquet`
        |ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(m.length == 5 && m.head.getSeq[String](1).size == 8)
    assert(m.head.getSeq[Int](2).size == 64 && m.head.getSeq[Int](3).size == 128)
    val hb = s2.sql(
      """SELECT hyperplane_buckets_md5(CAST(embedding AS ARRAY<DOUBLE>), 4, 8) AS hb
        |FROM parquet.`/root/testdata/sf0.001/embeddings.parquet` LIMIT 2""".stripMargin)
      .collect()
    assert(hb.length == 2 && hb.head.getSeq[String](0).size == 4)
  }

  test("two Duration converters share one codegen stage (freshName, no janino collision)") {
    // the doGenCode used to hardcode a local named `graftDur`: two
    // instances in the same whole-stage scope generated a duplicate
    // declaration, janino failed, and the stage silently dropped to
    // interpreted execution. Fallback is disabled here so a collision
    // FAILS instead of hiding.
    import org.apache.spark.sql.functions._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.fallback", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val r = s2.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy(col("doc_id")).limit(3)
      .select(
        graft.operators.Ottl.duration(concat((col("doc_id") % 5 + 1).cast("string"), lit("h"))).as("h"),
        graft.operators.Ottl.duration(concat((col("doc_id") % 7 + 1).cast("string"), lit("m"))).as("m"))
      .collect()
    assert(r.length == 3)
    assert(r.head.getLong(0) % 3600000000000L == 0 && r.head.getLong(0) > 0)
    assert(r.head.getLong(1) % 60000000000L == 0 && r.head.getLong(1) > 0)
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
