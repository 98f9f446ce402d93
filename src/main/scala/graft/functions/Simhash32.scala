package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst expression: 32-bit SimHash over token identities with
  * multiplicity. Bit j of the result is set when
  * Σ_tokens sign(bit_j(hash(t))) > 0, hash(t) = (t·2654435761) mod 2³²
  * (Knuth multiplicative) — the family the q16 DuckDB oracle reproduces.
  *
  * Replaces the `aggregate(tokens, 32-long acc, transform(...))` HOF
  * chain, which evaluated O(32·n) interpreted Catalyst nodes per row —
  * per-document cost on the same tier as the minhash signature. Here:
  * one fused int-array loop in whole-stage codegen.
  *
  * Edge semantics match the HOF form: null token elements leave the
  * accumulator untouched at every bit (the HOF's `when` yielded NULL,
  * `cnt + NULL = NULL`... see note) — NOTE the HOF actually POISONED the
  * accumulator on a null element (cnt + NULL = NULL → bucket NULL →
  * final OR treats it as unset); our tables carry containsNull=false
  * arrays so the case never arises, and the native form adopts the
  * cleaner skip-null semantics, asserted equivalent on non-null inputs.
  * Empty array -> every Σ is 0, no bit set -> 0L (same as HOF).
  */
case class Simhash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash32 needs array<int>, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = java.lang.Math.floorMod(
          arr.getInt(i).toLong * 2654435761L, 4294967296L)
        var j = 0
        while (j < 32) {
          if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $c.numElements();
         |int[] $counts = new int[32];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) continue;
         |  long $h = java.lang.Math.floorMod(
         |    (long) $c.getInt($i) * 2654435761L, 4294967296L);
         |  for (int $j = 0; $j < 32; $j++) {
         |    if ((($h >> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 32; $j++) {
         |  if ($counts[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash32 =
    copy(child = newChild)
}

object Simhash32 {
  /** Column API: simhash32(tokens) -> bigint. */
  def apply(tokens: Column): Column =
    Bridge.column(Simhash32(Bridge.expression(tokens)))
}
