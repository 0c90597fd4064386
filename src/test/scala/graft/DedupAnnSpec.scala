package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AnnOps, DedupOps, MultimodalOps, TextOps}

/** Behavioral specs for the rows-only (non-SQL-oracled) operators:
  * minhash/simhash/LSH must actually find near-duplicates and agree
  * with exact Jaccard on high-similarity pairs.
  */
class DedupAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = Tables(spark, sf, "documents")

  test("minhash LSH finds the high-jaccard pairs") {
    val sh = docs.select(col("doc_id"),
      DedupOps.shinglesOfText(col("text"), 3).as("shs"))
    val exact = DedupOps.jaccardPairs(sh, "doc_id", "shs", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain near-duplicate docs")

    val sig = docs.select(col("doc_id"),
      DedupOps.minhashSignature(
        DedupOps.shinglesOfText(col("text"), 3), 32).as("sig"))
    val found = DedupOps.lshNearDupPairs(sig, "doc_id", "sig", 8, 4, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(found.contains).toDouble / exact.size
    assert(recall >= 0.9, s"minhash recall of jaccard>=0.9 pairs: $recall (found ${found.size})")
  }

  test("simhash near-dup pairs have high jaccard") {
    val bits = docs.select(col("doc_id"),
      DedupOps.simhashBits(DedupOps.tokens(col("text"))).as("bits"))
    val pairs = DedupOps.simhashNearDupPairs(bits, "doc_id", "bits", 6)
    assert(pairs.count() > 0, "simhash should find near-dups in test data")
    // every Hamming<=2 pair should be genuinely similar in token space
    val tight = pairs.filter(col("hamming") <= 2)
    val sh = docs.select(col("doc_id"),
      DedupOps.shinglesOfText(col("text"), 3).as("shs"))
    val exact = DedupOps.jaccardPairs(sh, "doc_id", "shs", 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val t = tight.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    if (t.nonEmpty)
      assert(t.count(exact.contains).toDouble / t.length >= 0.8)
  }

  test("LSH ANN recalls most brute-force top-10 neighbors") {
    val e = Tables(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val bf = AnnOps.bruteForceTopK(q, e, 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = AnnOps.lshTopK(q, e, planes = 4, k = 10, tables = 16)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // neighbors here sit at ~72° (weakly clustered data), recall
    // 1-(1-(0.6)^4)^16 ≈ 0.9 with 16 tables of 4 planes
    val recall = bf.count(lsh.contains).toDouble / bf.size
    assert(recall >= 0.5, s"multi-table LSH recall: $recall")
  }

  test("IVF ANN recalls a meaningful share of brute-force top-10") {
    val e = Tables(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val bf = AnnOps.bruteForceTopK(q, e, 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = AnnOps.ivfTopK(q, e, c = 16, nprobe = 4, k = 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.count(ivf.contains).toDouble / bf.size
    // nprobe/c = 25% scan fraction; near-orthogonal neighbors keep the
    // cluster signal weak, so expect ≥ the scan fraction, not ~1.0
    assert(recall >= 0.2, s"IVF recall: $recall")
    assert(ivf.nonEmpty && ivf.forall { case (a, b) => a != b })
  }

  test("multimodal decodeFeatures plumbing produces typed features") {
    val media = MultimodalOps.asMedia(docs)
    val feats = MultimodalOps.decodeFeatures(spark, media)
    val r = feats.filter(_.modality == "image").head()
    assert(r.n_bytes > 0 && r.width == r.n_bytes % 640)
    assert(feats.count() == docs.count())
  }

  test("short docs (no shingles) never produce spurious near-dup pairs") {
    import org.apache.spark.sql.functions.lit
    val spark2 = spark
    import spark2.implicits._
    val tiny = Seq((1L, "one two"), (2L, "three four"), (3L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val sig = tiny.select(col("doc_id"),
      DedupOps.minhashSignature(DedupOps.shinglesOfText(col("text"), 3), 32).as("sig"))
    val pairs = DedupOps.lshNearDupPairs(sig, "doc_id", "sig", 8, 4, 0.5)
    // docs 1 and 2 have < 3 words => no shingles => must not pair up
    assert(pairs.count() == 0)
  }

  test("langId is deterministic and covers the stopword languages") {
    val preds = docs.withColumn("p", TextOps.langId(TextOps.tokens(col("text"))))
      .select("p").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "es", "de", "und")))
  }
}
