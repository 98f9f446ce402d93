package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst expression: sorted-distinct packed n-gram shingles.
  *
  * `NgramShingles(tokens, n)` slides an n-window over `array<int>` and
  * packs each window into an int64 with the base-1031 left fold
  * (`((t0·1031 + t1)·1031 + t2)...`, exact for token ids < 1031,
  * wrap-around collision-hashed above), then returns the SORTED DISTINCT
  * shingle set — the exact input shape `IntersectCount`'s merge-count
  * needs. Replaces a `array_sort(array_distinct(transform(sequence(...),
  * chained element_at)))` composition that evaluated O(n·ngram)
  * interpreted nodes per document plus three intermediate array passes.
  *
  * Edge semantics match the HOF form: a window containing a NULL token
  * packs to NULL, and the distinct set carries at most one NULL, sorted
  * last (array_sort's null placement); fewer than n tokens -> empty set
  * (the HOF required a size guard; this is total). NULL input -> NULL.
  */
case class NgramShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "n must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_shingles needs array<int>, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_shingles"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    new GenericArrayData(NgramShingles.pack(arr, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.NgramShingles.pack($c, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NgramShingles =
    copy(child = newChild)
}

object NgramShingles {

  /** Shared kernel (interpreted + codegen paths): sorted distinct packed
    * windows, one trailing null if any window contained a null token. */
  def pack(arr: ArrayData, n: Int): Array[Any] = {
    val len = arr.numElements()
    val windows = len - n + 1
    if (windows <= 0) return new Array[Any](0)
    val vals = new Array[Long](windows)
    var m = 0
    var anyNull = false
    var i = 0
    while (i < windows) {
      var v = 0L
      var nul = false
      var j = 0
      while (j < n && !nul) {
        if (arr.isNullAt(i + j)) nul = true
        else v = v * 1031L + arr.getInt(i + j)
        j += 1
      }
      if (nul) anyNull = true
      else { vals(m) = v; m += 1 }
      i += 1
    }
    java.util.Arrays.sort(vals, 0, m)
    var d = 0
    var k = 0
    while (k < m) {
      if (d == 0 || vals(k) != vals(d - 1)) { vals(d) = vals(k); d += 1 }
      k += 1
    }
    val out = new Array[Any](d + (if (anyNull) 1 else 0))
    var o = 0
    while (o < d) { out(o) = vals(o); o += 1 }
    out
  }

  /** Column API: ngram_shingles(tokens, n) -> sorted distinct array<long>. */
  def apply(tokens: Column, n: Int): Column =
    Bridge.column(NgramShingles(Bridge.expression(tokens), n))
}
