package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst expression: bucketed token histogram.
  *
  * `TokenHistogram(tokens, k)` returns `array<long>` of length k where
  * bucket b counts tokens with token mod k == b. This is the hot inner
  * loop of the grid-output analog (n_tok-normalized token histograms,
  * SURVEY.md §7.2); a higher-order-function composition would be
  * O(n_tok × k) per row (transform-inside-aggregate), this is O(n_tok)
  * with a primitive long[] and participates in whole-stage codegen via
  * doGenCode — no boxing, no UDF serialization.
  */
case class TokenHistogram(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets > 0, "buckets must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_histogram needs array<int>, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_histogram"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Long](buckets)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val b = arr.getInt(i) % buckets
      counts(if (b < 0) b + buckets else b) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |int $n = $c.numElements();
         |long[] $counts = new long[$buckets];
         |for (int $i = 0; $i < $n; $i++) {
         |  int $b = $c.getInt($i) % $buckets;
         |  if ($b < 0) $b += $buckets;
         |  $counts[$b] += 1L;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenHistogram =
    copy(child = newChild)
}

object TokenHistogram {
  /** Column API: token_histogram(tokens, k) -> array<long>[k]. */
  def apply(tokens: Column, buckets: Int): Column =
    Bridge.column(TokenHistogram(Bridge.expression(tokens), buckets))
}
