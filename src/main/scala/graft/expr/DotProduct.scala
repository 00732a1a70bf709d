package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two equal-length `array<double>` columns in ONE codegen'd
  * loop — the hot inner kernel of every similarity operator (cosine top-k,
  * near-dup verify, IVF assignment, hyperplane projections).
  *
  * Replaces the interpreted `aggregate`/`zip_with` fold (Spark never compiles
  * higher-order functions — the fold was the dominant cost of the round-2
  * similarity queries). The accumulation is the SAME left-to-right IEEE
  * sequence as the fold it replaces and as DuckDB's `list_reduce`/
  * `list_dot_product`, so every oracle comparison stays bit-for-bit (Java
  * forbids FMA contraction in `a += x * y`, so codegen cannot reorder it
  * either). Mismatched lengths are a hard error, matching the ANSI
  * out-of-bounds behavior of the indexed fold it replaces; a null ELEMENT on
  * either side yields NULL, matching the fold's null-poisoning sum. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = DotProduct.name

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (ys.numElements() != n)
      throw new IllegalArgumentException(
        s"$prettyName: length mismatch ($n vs ${ys.numElements()})")
    var i = 0
    var s = 0.0
    while (i < n) {
      // null element poisons the sum to NULL — the fold this replaces did the
      // same (null + x = null), and anything else would fabricate a score
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      s += xs.getDouble(i) * ys.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "${DotProduct.name}: length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val name = "graft_dot"

  /** Idempotently registers the expression in the session's function registry so
    * it is usable via `call_function(name, a, b)` and in SQL text. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => DotProduct(exprs(0), exprs(1)), "built-in")
}
