package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Warc

/** WARC/1.0 codec (ISO 28500 — the Common Crawl wire format): record
  * framing, HTTP payload stripping, multi-record buffers, the
  * record-per-gzip-member layout, and the Spark-side explode path. */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def mkBuffer: Array[Byte] = {
    val warcinfo = ("WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      "Content-Length: 15\r\n\r\n" +
      "software: graft" + "\r\n\r\n").getBytes("UTF-8")
    val request = ("WARC/1.0\r\n" +
      "WARC-Type: request\r\n" +
      "WARC-Target-URI: http://example.com/a\r\n" +
      "WARC-Date: 2024-01-01T00:00:01Z\r\n" +
      "Content-Type: application/http;msgtype=request\r\n" +
      "Content-Length: 40\r\n\r\n" +
      "GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n" +
      "\r\n\r\n").getBytes("UTF-8")
    val response = Warc.encodeResponse("http://example.com/a",
      "2024-01-01T00:00:02Z", "<html><body><p>hello warc</p></body></html>")
    warcinfo ++ request ++ response
  }

  test("multi-record buffer parses: types, uris, http payload stripped of headers") {
    val rs = Warc.parseRecords(mkBuffer)
    assert(rs.map(_.recordType) == Seq("warcinfo", "request", "response"))
    assert(rs(0).payload == "software: graft")
    assert(rs(0).httpStatus == -1)
    assert(rs(1).targetUri == "http://example.com/a")
    val resp = rs(2)
    assert(resp.httpStatus == 200)
    assert(resp.contentType.startsWith("application/http"))
    assert(resp.payload == "<html><body><p>hello warc</p></body></html>")
    assert(resp.warcDate == "2024-01-01T00:00:02Z")
  }

  test(".warc.gz: record-per-gzip-member (concatenated members) parses identically") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    // one member per record — the Common Crawl layout
    val members = gz(mkBuffer.slice(0, 0)) // empty leading member is legal
    val whole = gz(mkBuffer)
    val rs = Warc.parseRecords(members ++ whole)
    assert(rs.map(_.recordType) == Seq("warcinfo", "request", "response"))
    assert(rs(2).payload.contains("hello warc"))
  }

  test("truncated record never yields a partial row; trailing junk stops cleanly") {
    val buf = mkBuffer
    val truncated = buf.slice(0, buf.length - 30)
    val rs = Warc.parseRecords(truncated)
    // the complete records parse; the cut one is dropped whole
    assert(rs.length == 2)
    val junk = buf ++ "NOT-A-WARC-HEADER".getBytes("UTF-8")
    assert(Warc.parseRecords(junk).length == 3)
  }

  test("Spark path: binary column → exploded records; encode∘parse is the identity on payloads; html extract composes") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon")).toDF("doc_id", "body")
    val parsed = docs.select(col("doc_id"),
        explode(Warc.warc_records(Warc.warc_response(
          concat(lit("http://c/"), col("doc_id")),
          lit("2024-01-01T00:00:00Z"),
          concat(lit("<html><body><p>"), col("body"), lit("</p></body></html>")))))
          .as("r"))
    val rows = parsed.select(col("doc_id"), col("r.target_uri"),
        col("r.http_status"), col("r.payload")).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getInt(2) == 200))
    assert(rows.map(r => r.getLong(0) -> r.getString(3)).toMap == Map(
      1L -> "<html><body><p>alpha beta gamma</p></body></html>",
      2L -> "<html><body><p>delta epsilon</p></body></html>"))
    assert(rows.forall(r => r.getString(1) == s"http://c/${r.getLong(0)}"))
    // the ingestion composition: WARC payload → the oracled
    // html-to-text extraction stage
    val text = parsed.select(col("doc_id"),
        graft.operators.TextOps.htmlToText(col("r.payload")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(text(1L).contains("alpha beta gamma"))
  }

  test("config receiver: a warc directory pipeline extracts response payloads to the sink") {
    val dir = java.nio.file.Files.createTempDirectory("warc_in").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "crawl-0.warc"),
      mkBuffer)
    val sink = java.nio.file.Files.createTempDirectory("warc_out").toString + "/o"
    graft.pipeline.ConfigLoader.fromJson(
      s"""{"pipelines": {"corpus/warc": {
         |  "receiver": {"type": "warc", "path": "$dir"},
         |  "processors": [{"type": "filter",
         |                  "where": "record_type = 'response' AND http_status = 200"}],
         |  "exporters": [{"type": "parquet", "path": "$sink"}]}}}""".stripMargin)
      .run(spark)
    val back = spark.read.parquet(sink).collect()
    assert(back.length == 1)
    assert(back(0).getAs[String]("payload").contains("hello warc"))
  }

  test("jsonl exporter: gzip'd line-JSON corpus export round-trips, partitioned by shard") {
    val spark2 = spark
    import spark2.implicits._
    val in = java.nio.file.Files.createTempDirectory("jsonl_in").toString + "/in.parquet"
    Seq((1L, "alpha", 0), (2L, "beta", 1), (3L, "gamma", 0))
      .toDF("doc_id", "text", "shard").write.parquet(in)
    val out = java.nio.file.Files.createTempDirectory("jsonl_out").toString + "/corpus"
    graft.pipeline.ConfigLoader.fromJson(
      s"""{"pipelines": {"corpus/export": {
         |  "receiver": {"type": "parquet", "path": "$in"},
         |  "exporters": [{"type": "jsonl", "path": "$out",
         |    "compression": "gzip", "partitionBy": ["shard"]}]}}}""".stripMargin)
      .run(spark)
    // shard layout on disk, lossless JSON lines inside
    val shards = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shards.toSeq == Seq("shard=0", "shard=1"))
    val back = spark.read.json(s"$out/shard=*/")
    assert(back.count() == 3)
    assert(back.filter(col("doc_id") === 2L).head().getAs[String]("text") == "beta")
    // gzip actually applied
    assert(new java.io.File(s"$out/shard=0").listFiles()
      .exists(_.getName.endsWith(".gz")))
    // and the jsonl RECEIVER reads the exported corpus back
    val sink2 = java.nio.file.Files.createTempDirectory("jsonl_rt").toString + "/p"
    graft.pipeline.ConfigLoader.fromJson(
      s"""{"pipelines": {"corpus/reimport": {
         |  "receiver": {"type": "jsonl", "path": "$out/shard=*/"},
         |  "exporters": [{"type": "parquet", "path": "$sink2"}]}}}""".stripMargin)
      .run(spark)
    assert(spark.read.parquet(sink2).count() == 3)
  }

  test("image header parsing: PNG/JPEG/GIF dimensions from real container bytes; corrupt input is null") {
    import graft.operators.MultimodalOps
    // a REAL minimal PNG via the synthesis kernel
    val png = MultimodalOps.pngHeaderKernel(640, 480)
    val dPng = MultimodalOps.imageDimsKernel(png)
    assert(dPng != null && dPng.getInt(0) == 640 && dPng.getInt(1) == 480)
    assert(dPng.getUTF8String(2).toString == "png")

    // a minimal JPEG: SOI + APP0 stub + SOF0 frame header (h=33, w=49)
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val jpeg = b(0xFF, 0xD8) ++
      b(0xFF, 0xE0, 0x00, 0x04, 0x00, 0x00) ++             // APP0 len 4
      b(0xFF, 0xC0, 0x00, 0x0B, 8, 0x00, 33, 0x00, 49, 1, 0x11, 0x00, 0x00)
    val dJpeg = MultimodalOps.imageDimsKernel(jpeg)
    assert(dJpeg != null && dJpeg.getInt(0) == 49 && dJpeg.getInt(1) == 33)
    assert(dJpeg.getUTF8String(2).toString == "jpeg")

    // GIF89a logical screen 320×200 (little-endian)
    val gif = "GIF89a".getBytes("UTF-8") ++ b(0x40, 0x01, 0xC8, 0x00)
    val dGif = MultimodalOps.imageDimsKernel(gif)
    assert(dGif != null && dGif.getInt(0) == 320 && dGif.getInt(1) == 200)

    // WebP VP8X: canvas 160×90 encoded as minus-one 24-bit LE fields
    val webp = "RIFF".getBytes ++ b(0, 0, 0, 0) ++ "WEBPVP8X".getBytes ++
      b(0, 0, 0, 0) ++ // chunk size (unchecked)
      b(0x00, 0, 0, 0) ++ // flags + reserved
      b(159, 0, 0) ++ b(89, 0, 0) ++ b(0, 0) // canvas-1 fields + pad
    val dWebp = MultimodalOps.imageDimsKernel(webp)
    assert(dWebp != null && dWebp.getInt(0) == 160 && dWebp.getInt(1) == 90)
    assert(dWebp.getUTF8String(2).toString == "webp")

    // the sniffer agrees with the parsers across the container family
    val spark2b = spark
    import spark2b.implicits._
    val blobs = Seq(
      ("png", MultimodalOps.pngHeaderKernel(1, 1)),
      ("wav", MultimodalOps.wavHeaderKernel(1, 8000)),
      ("mp4", MultimodalOps.mp4HeaderKernel(1000, 1000L)),
      ("webp", webp)).toDF("kind", "blob")
    val sniffed = blobs.select(col("kind"),
        MultimodalOps.sniffMime(col("blob")).as("mime"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sniffed == Map("png" -> "image/png", "wav" -> "audio/wav",
      "mp4" -> "video/mp4", "webp" -> "image/webp"))

    // corrupt/unknown bytes parse to null, never to garbage dims
    assert(MultimodalOps.imageDimsKernel("not an image".getBytes) == null)
    assert(MultimodalOps.imageDimsKernel(jpeg.slice(0, 6)) == null)

    // Spark path: synthesize → parse, codegen'd end to end
    val dims = spark.range(1, 4).select(
        MultimodalOps.imageDims(MultimodalOps.pngHeader(
          (col("id") * 10).cast("int"), (col("id") * 7).cast("int"))).as("d"))
      .select(col("d.width"), col("d.height"), col("d.format")).collect()
    assert(dims.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((10, 7), (20, 14), (30, 21)))
    assert(dims.forall(_.getString(2) == "png"))
  }

  test("audio header parsing: WAV fmt chunk yields channels/rate/bits; non-WAV is null") {
    import graft.operators.MultimodalOps
    val wav = MultimodalOps.wavHeaderKernel(2, 44100)
    val m = MultimodalOps.audioMetaKernel(wav)
    assert(m != null && m.getInt(0) == 2 && m.getInt(1) == 44100 && m.getInt(2) == 16)
    // a RIFF that is not WAVE (the webp/avi container family) is null
    val avi = "RIFF".getBytes ++ Array.fill(4)(0.toByte) ++ "AVI ".getBytes
    assert(MultimodalOps.audioMetaKernel(avi) == null)
    assert(MultimodalOps.audioMetaKernel(wav.slice(0, 10)) == null)
    // Spark path roundtrip
    val metas = spark.range(1, 3).select(
        MultimodalOps.audioMeta(MultimodalOps.wavHeader(
          col("id").cast("int"), lit(16000))).as("m"))
      .select(col("m.channels"), col("m.sample_rate")).collect()
    assert(metas.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((1, 16000), (2, 16000)))
  }

  test("video header parsing: MP4 mvhd box walk yields timescale and duration; non-MP4 is null") {
    import graft.operators.MultimodalOps
    val mp4 = MultimodalOps.mp4HeaderKernel(600, 3000L) // 5 s at 600 tps
    val m = MultimodalOps.videoMetaKernel(mp4)
    assert(m != null && m.getInt(0) == 600 && m.getLong(1) == 3000L)
    assert(m.getLong(2) == 5000L)
    assert(MultimodalOps.videoMetaKernel("not a video at all".getBytes) == null)
    assert(MultimodalOps.videoMetaKernel(mp4.slice(0, 20)) == null)
    // a moov with no mvhd parses to null, not garbage
    val noMvhd = mp4.clone()
    noMvhd(16 + 4 + 4) = 'x'.toByte // corrupt the mvhd type tag start
    assert(MultimodalOps.videoMetaKernel(noMvhd) == null)
    // Spark path
    val ms = spark.range(1, 3).select(
        MultimodalOps.videoMeta(MultimodalOps.mp4Header(
          lit(1000), col("id") * 1500)).as("v"))
      .select(col("v.duration_ms")).collect().map(_.getLong(0)).toSeq
    assert(ms == Seq(1500L, 3000L))
  }
}
