package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Native C-`%g` significant-digit formatter (P6) — the round-1 sinks
  * used a Scala UDF here, the one UDF left in the repo: a UDF forces
  * encode/decode of every row crossing the sink projection and blocks
  * whole-stage codegen. This expression keeps the formatting inside
  * codegen (one virtual call per value, no row conversion).
  *
  * Semantics are CsvSink.gFormatValue's exactly (shared implementation):
  * Java `%.Ng` with C-style mantissa zero-trimming in both fixed and
  * exponent form, NaN/Inf -> "NaN"/"Inf"/"-Inf". Null in -> null out
  * (the sink wraps with coalesce(..., "") like the old UDF did). */
case class GFormat(child: Expression, digits: Int) extends UnaryExpression {
  require(digits > 0 && digits <= 17, s"digits out of range: $digits")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"g_format needs float/double, got ${other.catalogString}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "g_format"

  /** shared by eval and codegen (via reference object). */
  def fmt(v: Double): UTF8String =
    UTF8String.fromString(graft.sinks.CsvSink.gFormatValue(v, digits))

  override def nullSafeEval(input: Any): Any = input match {
    case f: java.lang.Float => fmt(f.toDouble)
    case d: java.lang.Double => fmt(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("gfmt", this, classOf[GFormat].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.fmt((double) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GFormat =
    copy(child = newChild)
}

object GFormat {
  def format(c: Column, digits: Int): Column =
    Bridge.column(GFormat(Bridge.expression(c), digits))
}
