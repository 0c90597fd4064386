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
      .when(h.startsWith("52494646"), "audio/wav") // RIFF container
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
}
