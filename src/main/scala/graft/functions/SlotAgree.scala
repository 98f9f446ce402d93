package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst expression: count of positions where two `array<long>`
  * signatures agree (both non-null and equal). The minhash
  * signature-estimated-Jaccard verify step runs this once per CANDIDATE
  * PAIR — the highest-volume row stream in the LSH dedup path (80k+
  * pairs at sf0.01 q25, bucket-bounded but large at corpus scale), where
  * the `size(filter(zip_with(...)))` composition allocated two
  * intermediate arrays and evaluated O(H) interpreted nodes per pair.
  *
  * Matches the HOF exactly: positions beyond the shorter array (zip_with
  * null-pads) and positions where either side is NULL never count;
  * NULL === NULL does not count (SQL equality, not <=>). NULL input
  * array -> NULL.
  */
case class SlotAgree(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"slot_agree needs two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "slot_agree"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
        c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)
         |      && $x.getLong($i) == $y.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SlotAgree =
    copy(left = newLeft, right = newRight)
}

object SlotAgree {
  /** Column API: slot_agree(a, b) -> int. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(SlotAgree(Bridge.expression(a), Bridge.expression(b)))
}
