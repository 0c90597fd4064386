package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Image container-header kernels (see MultimodalOps: PNG IHDR /
  * JPEG SOFn walk / GIF screen descriptor — dimensions without a
  * codec): native expressions so header extraction over a media lake
  * is one codegen'd map-side pass. */
case class ImageDims(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "image_dims"
  override def nullSafeEval(input: Any): Any =
    graft.operators.MultimodalOps.imageDimsKernel(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.operators.MultimodalOps.imageDimsKernel($c);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildInternal(c: Expression): ImageDims =
    copy(child = c)
}

case class AudioMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "audio_meta"
  override def nullSafeEval(input: Any): Any =
    graft.operators.MultimodalOps.audioMetaKernel(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.operators.MultimodalOps.audioMetaKernel($c);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildInternal(c: Expression): AudioMeta =
    copy(child = c)
}

case class WavHeader(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_header"
  override def nullSafeEval(c: Any, r: Any): Any =
    graft.operators.MultimodalOps.wavHeaderKernel(
      c.asInstanceOf[Number].intValue(), r.asInstanceOf[Number].intValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, r) =>
      s"graft.operators.MultimodalOps.wavHeaderKernel((int)$c, (int)$r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WavHeader =
    copy(left = l, right = r)
}

case class VideoMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration_ticks", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "video_meta"
  override def nullSafeEval(input: Any): Any =
    graft.operators.MultimodalOps.videoMetaKernel(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.operators.MultimodalOps.videoMetaKernel($c);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildInternal(c: Expression): VideoMeta =
    copy(child = c)
}

case class Mp4Header(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "mp4_header"
  override def nullSafeEval(ts: Any, dur: Any): Any =
    graft.operators.MultimodalOps.mp4HeaderKernel(
      ts.asInstanceOf[Number].intValue(), dur.asInstanceOf[Number].longValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ts, dur) =>
      s"graft.operators.MultimodalOps.mp4HeaderKernel((int)$ts, (long)$dur)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Mp4Header =
    copy(left = l, right = r)
}

case class PngHeader(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_header"
  override def nullSafeEval(w: Any, h: Any): Any =
    graft.operators.MultimodalOps.pngHeaderKernel(
      w.asInstanceOf[Number].intValue(), h.asInstanceOf[Number].intValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, h) =>
      s"graft.operators.MultimodalOps.pngHeaderKernel((int)$w, (int)$h)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PngHeader =
    copy(left = l, right = r)
}
