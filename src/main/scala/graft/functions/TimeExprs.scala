package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.impl.Kernels

/** Native time/duration expressions for the OTTL converter surface
  * (reference behavior, not code: the transform processor's Duration
  * converter — time.ParseDuration semantics). One static kernel call
  * inside whole-stage codegen; malformed input yields NULL (the
  * transform processor's error_mode=ignore discipline), never a
  * query-killing throw. */
object TimeExprs {
  /** Column API: Go duration string ("1h30m", "250ms", "-1.5h") →
    * nanoseconds as long; NULL on malformed input. */
  def go_duration_ns(dur: Column): Column =
    Bridge.column(GoDurationNs(Bridge.expression(dur)))
}

case class GoDurationNs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "go_duration_ns"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.goDurationNs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, not a fixed identifier: two instances of this
      // expression in one whole-stage-codegen scope would otherwise
      // declare the same local twice, fail janino, and silently drop
      // the stage to interpreted execution
      val dur = ctx.freshName("graftDur")
      s"""
      java.lang.Long $dur = graft.functions.impl.Kernels.goDurationNs($c);
      if ($dur == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $dur.longValue(); }
    """
    })
  override protected def withNewChildInternal(newChild: Expression): GoDurationNs =
    copy(child = newChild)
}
