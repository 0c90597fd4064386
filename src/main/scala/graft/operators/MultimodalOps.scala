package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque binary columns with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * The decode step is a STUB (no image/audio codecs in this
  * environment): `stubDecode` derives deterministic fake dimensions
  * from the byte stream. The Spark-side plumbing — binary schema,
  * partition-batched decoding seam, typed output — is real: swap
  * `stubDecode` for a codec call and nothing else changes.
  */
object MultimodalOps {

  final case class MediaRecord(doc_id: Long, modality: String, blob: Array[Byte])
  final case class MediaFeatures(doc_id: Long, modality: String, n_bytes: Int,
                                 width: Int, height: Int, checksum: Long)

  /** wrap text rows as opaque blobs (stand-in for real media bytes) */
  def asMedia(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      when(col("source").rlike("[02468]$"), lit("image")).otherwise(lit("audio"))
        .as("modality"),
      col("text").cast("binary").as("blob"))

  /** STUB decoder: deterministic fake dimensions from byte content.
    * Real implementation would decode the codec header here — per
    * partition, so codec init cost amortizes over the batch.
    */
  private def stubDecode(r: MediaRecord): MediaFeatures = {
    val n = r.blob.length
    var ck = 1469598103934665603L // FNV-1a over the bytes
    var i = 0
    while (i < n) { ck = (ck ^ (r.blob(i) & 0xff)) * 1099511628211L; i += 1 }
    MediaFeatures(r.doc_id, r.modality, n, n % 640, (n * 7) % 480, ck)
  }

  /** Aspect-preserving resize planning: target dimensions for fitting
    * (w, h) into a (maxW, maxH) box without upscaling — all-integer
    * arithmetic (w·outH DIV h), so the plan is engine-exact; the
    * pixel resample itself belongs in the partition-batched decode
    * seam next to the codec. Returns (out_w, out_h) columns.
    */
  def resizeDims(w: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column,
                 maxW: Int, maxH: Int):
      (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    // floor(a/b) over small exact ints: IEEE division is correctly
    // rounded, so integer-valued ratios stay exact on every engine
    val heightBound = w * maxH <= h * maxW
    val hB = least(h, lit(maxH))
    val wFromH = floor(w * hB / h).cast("int")
    val wB = least(w, lit(maxW))
    val hFromW = floor(h * wB / w).cast("int")
    val degenerate = h === 0 || w === 0
    val ow = when(degenerate, 0).when(heightBound, wFromH).otherwise(wB)
    val oh = when(degenerate, 0).when(heightBound, hB).otherwise(hFromW)
    (ow, oh)
  }

  /** Tile-grid planning: the vision-preprocessing step that cuts an
    * image into fixed-size tiles (edge tiles clamped) before a
    * per-tile encoder — one row per tile with its pixel rectangle.
    * All-integer arithmetic; the pixel crop itself belongs in the
    * partition-batched decode seam. Emits (tile_x, tile_y, tx, ty,
    * tw, th) rows per input row.
    */
  def tilePlan(df: DataFrame, w: org.apache.spark.sql.Column,
               h: org.apache.spark.sql.Column, tile: Int): DataFrame =
    df.withColumn("tile_x", explode(sequence(lit(0),
        greatest(ceil(w / lit(tile)).cast("int") - 1, lit(0)))))
      .withColumn("tile_y", explode(sequence(lit(0),
        greatest(ceil(h / lit(tile)).cast("int") - 1, lit(0)))))
      .withColumn("tx", col("tile_x") * tile)
      .withColumn("ty", col("tile_y") * tile)
      .withColumn("tw", least(lit(tile), w - col("tx")).cast("int"))
      .withColumn("th", least(lit(tile), h - col("ty")).cast("int"))
      .filter(col("tw") > 0 && col("th") > 0)

  /** Content-type sniffing from magic bytes — the media-ingest
    * triage step (route/validate blobs by what they ARE, not what
    * their path claims, before handing them to a per-modality decode
    * seam). Checks the canonical signatures over only the first 12
    * bytes (hex of a 12-byte slice — never the whole blob), falling
    * back to application/octet-stream. Pure column expression,
    * codegen'd, engine-exact (byte compares). */
  def sniffMime(blob: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = upper(hex(substring(blob, 1, 12)))
    when(h.startsWith("89504E470D0A1A0A"), "image/png")
      .when(h.startsWith("FFD8FF"), "image/jpeg")
      .when(h.startsWith("474946383761") || h.startsWith("474946383961"), "image/gif")
      // RIFF container: the form type at bytes 9-12 disambiguates
      .when(h.startsWith("52494646") && substring(h, 17, 8) === "57454250",
        "image/webp")
      .when(h.startsWith("52494646"), "audio/wav")
      .when(substring(h, 9, 8) === "66747970", "video/mp4") // ....ftyp
      .when(h.startsWith("1A45DFA3"), "video/webm") // EBML
      .when(h.startsWith("494433"), "audio/mpeg") // ID3
      .otherwise("application/octet-stream")
  }

  /** partition-batched decode: the shape a real codec needs (one
    * expensive init per partition, streamed records). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // real codec: init decoder once here, then stream the batch
      it.map(stubDecode)
    }
  }

  // ----------------------------------------------------------------
  // REAL header parsing — dimensions live in the container headers,
  // no codec needed: PNG IHDR (spec §11.2.2: big-endian u32 w/h right
  // after the 8-byte signature + IHDR chunk header), JPEG SOFn
  // segment walk (ITU T.81 B.2.2: height/width in the frame header),
  // GIF logical screen descriptor (bytes 6-9, little-endian u16).
  // One native expression per blob, map-side; corrupt/unknown → null.
  // ----------------------------------------------------------------

  /** (width, height, format) parsed from real image bytes */
  def imageDims(blob: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.ImageDims(
        org.apache.spark.sql.graftbridge.Bridge.expression(blob)))

  /** a REAL minimal PNG (valid signature + IHDR) for the given
    * dimensions — synthesis half of the roundtrip */
  def pngHeader(w: org.apache.spark.sql.Column,
                h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.PngHeader(
        org.apache.spark.sql.graftbridge.Bridge.expression(w),
        org.apache.spark.sql.graftbridge.Bridge.expression(h)))

  def imageDimsKernel(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    def u8(i: Int): Int = b(i) & 0xFF
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def row(w: Long, h: Long, fmt: String) =
      org.apache.spark.sql.catalyst.InternalRow(w.toInt, h.toInt,
        org.apache.spark.unsafe.types.UTF8String.fromString(fmt))
    if (b.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
        u8(3) == 'G' && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      row(be32(16), be32(20), "png")
    else if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      // JPEG: walk marker segments to the first SOFn frame header
      var p = 2
      while (p + 9 < b.length) {
        if (u8(p) != 0xFF) return null
        val marker = u8(p + 1)
        if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD9)) p += 2
        else {
          val len = be16(p + 2)
          if (len < 2 || p + 2 + len > b.length) return null
          // SOF0-3, 5-7, 9-11, 13-15 all carry the frame dimensions
          if ((marker >= 0xC0 && marker <= 0xCF) && marker != 0xC4 &&
              marker != 0xC8 && marker != 0xCC)
            return row(be16(p + 7).toLong, be16(p + 5).toLong, "jpeg")
          p += 2 + len
        }
      }
      null
    }
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      row(le16(6).toLong, le16(8).toLong, "gif")
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
             b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
             b(11) == 'P') {
      // WebP: VP8X extended header (canvas = 24-bit LE minus-one
      // fields) or VP8L lossless (14-bit packed minus-one fields);
      // plain lossy VP8 needs the frame decoder → null, honestly
      def le24(i: Int): Long = u8(i).toLong | (u8(i + 1) << 8) | (u8(i + 2) << 16)
      if (b.length >= 30 && b(12) == 'V' && b(13) == 'P' && b(14) == '8' &&
          b(15) == 'X')
        row(le24(24) + 1, le24(27) + 1, "webp")
      else if (b.length >= 25 && b(12) == 'V' && b(13) == 'P' && b(14) == '8' &&
               b(15) == 'L' && u8(20) == 0x2F) {
        val bits = le24(21) | (u8(24).toLong << 24)
        row((bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, "webp")
      } else null
    }
    else null
  }

  /** (channels, sample_rate, bits_per_sample) from a RIFF/WAVE fmt
    * chunk (the audio twin of [[imageDims]] — metadata without a
    * codec); null for non-WAV or truncated bytes */
  def audioMeta(blob: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.AudioMeta(
        org.apache.spark.sql.graftbridge.Bridge.expression(blob)))

  def wavHeader(channels: org.apache.spark.sql.Column,
                sampleRate: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.WavHeader(
        org.apache.spark.sql.graftbridge.Bridge.expression(channels),
        org.apache.spark.sql.graftbridge.Bridge.expression(sampleRate)))

  def audioMetaKernel(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    def u8(i: Int): Int = b(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return null
    // chunk walk to `fmt `
    var p = 12
    while (p + 8 <= b.length) {
      val id = new String(b, p, 4, "US-ASCII")
      val size = le32(p + 4)
      if (id == "fmt ") {
        if (size < 16 || p + 8 + 16 > b.length) return null
        return org.apache.spark.sql.catalyst.InternalRow(
          le16(p + 10), le32(p + 12).toInt, le16(p + 22))
      }
      if (size < 0 || size > Int.MaxValue - 8) return null
      p += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    null
  }

  def wavHeaderKernel(channels: Int, sampleRate: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    ascii("RIFF"); le32(36); ascii("WAVE")
    ascii("fmt "); le32(16)
    le16(1) /* PCM */; le16(channels); le32(sampleRate.toLong)
    le32(sampleRate.toLong * channels * 2) /* byte rate */
    le16(channels * 2) /* block align */; le16(16) /* bits */
    ascii("data"); le32(0)
    out.toByteArray
  }

  /** (timescale, duration_ticks, duration_ms) from an MP4 moov/mvhd
    * box walk (ISO 14496-12 §8.2.2 — the container header, no codec);
    * null for non-MP4/truncated bytes. Completes the image/audio/
    * video header-parsing triple. */
  def videoMeta(blob: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.VideoMeta(
        org.apache.spark.sql.graftbridge.Bridge.expression(blob)))

  def mp4Header(timescale: org.apache.spark.sql.Column,
                durationTicks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.Mp4Header(
        org.apache.spark.sql.graftbridge.Bridge.expression(timescale),
        org.apache.spark.sql.graftbridge.Bridge.expression(durationTicks)))

  def videoMetaKernel(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    def u8(i: Int): Int = b(i) & 0xFF
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    // top-level box walk: [size type payload]*, ftyp first by spec
    if (b.length < 8) return null
    var p = 0
    var sawFtyp = false
    while (p + 8 <= b.length) {
      val size = be32(p)
      val typ = new String(b, p + 4, 4, "US-ASCII")
      if (size < 8 || p + size > b.length) return null
      if (typ == "ftyp") sawFtyp = true
      else if (typ == "moov" && sawFtyp) {
        // child walk inside moov for mvhd
        var q = p + 8
        while (q + 8 <= p + size) {
          val csize = be32(q)
          val ctyp = new String(b, q + 4, 4, "US-ASCII")
          if (csize < 8 || q + csize > p + size) return null
          if (ctyp == "mvhd") {
            val version = u8(q + 8)
            if (version != 0 || csize < 8 + 4 + 16) return null // v0 only
            val timescale = be32(q + 8 + 4 + 8)
            val duration = be32(q + 8 + 4 + 12)
            if (timescale <= 0) return null
            return org.apache.spark.sql.catalyst.InternalRow(
              timescale.toInt, duration,
              duration * 1000L / timescale)
          }
          q += csize.toInt
        }
        return null
      }
      p += size.toInt
    }
    null
  }

  def mp4HeaderKernel(timescale: Int, durationTicks: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    be32(16); ascii("ftyp"); ascii("isom"); be32(0)
    // moov{ mvhd v0: version/flags + created/modified + timescale +
    // duration + the fixed trailer the spec sizes at 100 bytes }
    val mvhdSize = 8 + 100
    be32(8L + mvhdSize); ascii("moov")
    be32(mvhdSize.toLong); ascii("mvhd")
    be32(0) // version 0 + flags
    be32(0); be32(0) // created/modified
    be32(timescale.toLong); be32(durationTicks)
    (0 until (100 - 4 - 16) / 4).foreach(_ => be32(0)) // rate..next_track
    out.toByteArray
  }

  def pngHeaderKernel(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte), 0, 8)
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    be32(13) // IHDR length
    out.write('I'); out.write('H'); out.write('D'); out.write('R')
    be32(w.toLong); be32(h.toLong)
    // bit depth 8, color type 2 (truecolor), deflate, no filter/interlace
    out.write(8); out.write(2); out.write(0); out.write(0); out.write(0)
    be32(0) // CRC slot (parsers that verify would compute it; ours doesn't)
    out.toByteArray
  }
}
