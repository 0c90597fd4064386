package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Transport compression for the binary export path — the
  * otlphttpexporter gzips request bodies before the wire (reference:
  * exporter/otlphttpexporter — behavior, not code); graft's parquet
  * sinks already compress storage (zstd), these cover the raw
  * Export*ServiceRequest blob path (spool files, queue payloads).
  * Plain JDK gzip, codegen'd, deflate level default.
  */
object GzipExprs {

  def gzip_compress(bytes: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(GzipCompress(org.apache.spark.sql.graftbridge.Bridge.expression(bytes)))

  def gzip_decompress(bytes: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(GzipDecompress(org.apache.spark.sql.graftbridge.Bridge.expression(bytes)))

  /** bounded decompress: gzip bombs must fail loudly, not OOM an
    * executor — 256 MiB per blob is far above any sane request */
  val MaxDecompressed: Int = 256 * 1024 * 1024

  def compress(in: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(in.length / 2 + 16)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(in)
    gz.close()
    bos.toByteArray
  }

  def decompress(in: Array[Byte]): Array[Byte] = {
    val gz = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(in))
    val bos = new java.io.ByteArrayOutputStream(in.length * 4 + 16)
    val buf = new Array[Byte](64 * 1024)
    var total = 0
    var n = gz.read(buf)
    while (n > 0) {
      total += n
      if (total > MaxDecompressed)
        throw new IllegalArgumentException(
          s"gzip payload exceeds $MaxDecompressed decompressed bytes")
      bos.write(buf, 0, n)
      n = gz.read(buf)
    }
    gz.close()
    bos.toByteArray
  }
}

case class GzipCompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip_compress"

  override def nullSafeEval(input: Any): Any =
    GzipExprs.compress(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipExprs.compress($c)")

  override protected def withNewChildInternal(c: Expression): GzipCompress = copy(child = c)
}

case class GzipDecompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip_decompress"

  override def nullSafeEval(input: Any): Any =
    GzipExprs.decompress(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipExprs.decompress($c)")

  override protected def withNewChildInternal(c: Expression): GzipDecompress = copy(child = c)
}
