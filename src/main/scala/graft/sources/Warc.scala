package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** WARC (ISO 28500 / WARC/1.0) record codec — the wire format of web
  * corpora (Common Crawl): the INGESTION seam upstream of
  * q_html_extract and every web-corpus operator in §2. Hand-rolled
  * like the repo's other wire formats (pb varint, Arrow IPC, h2c):
  * native Catalyst expressions walk the record framing
  * (`WARC/1.0` header block, Content-Length payload slice, \r\n\r\n
  * separators) in one codegen'd pass per file — no UDFs, no
  * driver-side parsing. Multi-member gzip (`.warc.gz`, one member per
  * record — the Common Crawl layout) decompresses via the JDK's
  * concatenated-member GZIPInputStream before the walk.
  *
  * Scale shape: files arrive via binaryFile (one row per WARC file,
  * ~1 GB in production splits); record explosion is map-side; only
  * extracted fields flow further, raw bytes never shuffle.
  */
object Warc {

  val recordType: StructType = StructType(Seq(
    StructField("record_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    // HTTP status for application/http responses, -1 otherwise
    StructField("http_status", IntegerType, nullable = false),
    // payload AFTER HTTP headers for http records, raw block otherwise
    StructField("payload", StringType, nullable = true)))

  /** all records of one WARC file (possibly .gz) as an array column */
  def warc_records(bytes: Column): Column =
    Bridge.column(WarcRecords(Bridge.expression(bytes)))

  /** one WARC response record wrapping an HTTP 200 text/html payload —
    * the synthesis half (specs + q_warc_extract roundtrip) */
  def warc_response(uri: Column, date: Column, html: Column): Column =
    Bridge.column(WarcResponse(Bridge.expression(uri),
      Bridge.expression(date), Bridge.expression(html)))

  /** binaryFile frame → exploded record rows (path, record fields) */
  def parseFiles(files: DataFrame): DataFrame =
    files.select(col("path"), explode(warc_records(col("content"))).as("r"))
      .select(col("path"), col("r.record_type"), col("r.target_uri"),
        col("r.warc_date"), col("r.content_type"), col("r.http_status"),
        col("r.payload"))

  // ------------------------- kernels -------------------------

  private val Crlf = "\r\n"

  def encodeResponse(uri: String, date: String, html: String): Array[Byte] = {
    val httpBlock = ("HTTP/1.1 200 OK" + Crlf +
      "Content-Type: text/html; charset=UTF-8" + Crlf + Crlf).getBytes("UTF-8") ++
      html.getBytes("UTF-8")
    val header = "WARC/1.0" + Crlf +
      "WARC-Type: response" + Crlf +
      s"WARC-Target-URI: $uri" + Crlf +
      s"WARC-Date: $date" + Crlf +
      "Content-Type: application/http;msgtype=response" + Crlf +
      s"Content-Length: ${httpBlock.length}" + Crlf + Crlf
    header.getBytes("UTF-8") ++ httpBlock ++ (Crlf + Crlf).getBytes("UTF-8")
  }

  /** parse a whole WARC buffer (gunzipping first when the gzip magic
    * leads — JDK GZIPInputStream consumes concatenated members, the
    * .warc.gz record-per-member layout) */
  def parseRecords(bytes0: Array[Byte]): Seq[Record] = {
    val bytes =
      if (bytes0.length >= 2 && (bytes0(0) & 0xFF) == 0x1f &&
          (bytes0(1) & 0xFF) == 0x8b) {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes0))
        try in.readAllBytes() finally in.close()
      } else bytes0
    val out = scala.collection.mutable.ArrayBuffer[Record]()
    var p = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length &&
             !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      i
    }
    while (p < bytes.length) {
      // skip inter-record padding
      while (p + 1 < bytes.length && bytes(p) == '\r' && bytes(p + 1) == '\n') p += 2
      if (p >= bytes.length) return out.toSeq
      val verEnd = lineEnd(p)
      val version = new String(bytes, p, verEnd - p, "UTF-8")
      if (!version.startsWith("WARC/")) return out.toSeq // trailing junk: stop
      p = verEnd + 2
      // named header fields until the empty line
      var recType: String = null; var uri: String = null
      var date: String = null; var ctype: String = null
      var clen = -1L
      var done = false
      while (!done && p < bytes.length) {
        val e = lineEnd(p)
        if (e == p) { p += 2; done = true } // empty line: block follows
        else {
          val line = new String(bytes, p, e - p, "UTF-8")
          val c = line.indexOf(':')
          if (c > 0) {
            val k = line.substring(0, c).trim.toLowerCase
            val v = line.substring(c + 1).trim
            k match {
              case "warc-type" => recType = v
              case "warc-target-uri" => uri = v
              case "warc-date" => date = v
              case "content-type" => ctype = v
              case "content-length" => clen = v.toLong
              case _ => ()
            }
          }
          p = e + 2
        }
      }
      // truncated or absurd (a block can't exceed the buffer, and a
      // single record past 2 GiB would break the Int slice — stop
      // cleanly rather than wrap)
      if (clen < 0 || clen > Int.MaxValue || p + clen > bytes.length)
        return out.toSeq
      val block = java.util.Arrays.copyOfRange(bytes, p, p + clen.toInt)
      p += clen.toInt
      // http payload: strip the status line + headers of the block
      var status = -1
      var payload = block
      if (ctype != null && ctype.startsWith("application/http")) {
        var q = 0
        def blockLineEnd(from: Int): Int = {
          var i = from
          while (i + 1 < block.length &&
                 !(block(i) == '\r' && block(i + 1) == '\n')) i += 1
          i
        }
        val se = blockLineEnd(0)
        val statusLine = new String(block, 0, se, "UTF-8")
        val parts = statusLine.split(" ")
        if (parts.length >= 2 && parts(0).startsWith("HTTP/"))
          status = scala.util.Try(parts(1).toInt).getOrElse(-1)
        q = se + 2
        var hdone = false
        while (!hdone && q < block.length) {
          val e = blockLineEnd(q)
          if (e == q) { q = e + 2; hdone = true } else q = e + 2
        }
        payload = java.util.Arrays.copyOfRange(block, q, block.length)
      }
      out += Record(recType, uri, date, ctype, status,
        new String(payload, "UTF-8"))
    }
    out.toSeq
  }

  final case class Record(recordType: String, targetUri: String,
                          warcDate: String, contentType: String,
                          httpStatus: Int, payload: String)

  /** static kernel for codegen: bytes → Catalyst array<struct> */
  def recordsKernel(bytes: Array[Byte]): ArrayData = {
    val rs = parseRecords(bytes)
    new GenericArrayData(rs.map { r =>
      InternalRow(
        if (r.recordType == null) null else UTF8String.fromString(r.recordType),
        if (r.targetUri == null) null else UTF8String.fromString(r.targetUri),
        if (r.warcDate == null) null else UTF8String.fromString(r.warcDate),
        if (r.contentType == null) null else UTF8String.fromString(r.contentType),
        r.httpStatus,
        UTF8String.fromString(r.payload))
    }.toArray[Any])
  }

  def responseKernel(uri: UTF8String, date: UTF8String,
                     html: UTF8String): Array[Byte] =
    encodeResponse(uri.toString, date.toString, html.toString)
}

case class WarcRecords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(Warc.recordType, containsNull = false)
  override def prettyName: String = "warc_records"
  override def nullSafeEval(input: Any): Any =
    Warc.recordsKernel(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sources.Warc.recordsKernel($c)")
  override protected def withNewChildInternal(c: Expression): WarcRecords =
    copy(child = c)
}

case class WarcResponse(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "warc_response"
  override def nullSafeEval(u: Any, d: Any, h: Any): Any =
    Warc.responseKernel(u.asInstanceOf[UTF8String], d.asInstanceOf[UTF8String],
      h.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (u, d, h) =>
      s"graft.sources.Warc.responseKernel($u, $d, $h)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WarcResponse =
    copy(first = f, second = s, third = t)
}
