package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** All `bands` random-hyperplane band signatures of one `array<double>` embedding
  * in ONE compiled triple loop — the banding kernel of the OR-amplified LSH
  * operators ([[graft.docs.Similarity.lshNearDupPairs]], `lshCosineTopK`, and the
  * embedding cluster dedup built on them).
  *
  * Returns `array<long>` of length `bands`; bit `p` of element `b` is the sign of
  * the projection of the embedding onto global hyperplane `b * planes + p`. The
  * ±1 plane matrix is fully determined by (dim, planes, bands) via
  * [[HyperplaneBands.planeSign]] and ships ONCE per plan as a codegen reference
  * object.
  *
  * Replaces the unrolled `when(graft_dot(emb, literal-plane) >= 0, 1L << p)`
  * construction: at the production shape (planes=5, bands=40, dim=64) that form
  * inlined 200 [[DotProduct]] calls plus 200 64-element literal arrays into one
  * generated method, blowing Janino's 64 KB method limit — Spark silently fell
  * back to INTERPRETED evaluation for the banding stage of a declared 100 TB
  * scale-path operator (round-6 codegen audit). One expression keeps the stage
  * inside whole-stage codegen at any (planes, bands).
  *
  * Bit-for-bit contract with the form it replaces (and with the DuckDB oracle's
  * `list_reduce` fold): each projection accumulates left-to-right from 0.0
  * (`s += e_j * h_j` — Java forbids FMA contraction, codegen cannot reorder), and
  * the sign test is nan-safe `>= 0` (NaN and -0.0 both set the bit, matching
  * Spark's `GreaterThanOrEqual` on doubles). Null input array or any null element
  * yields ALL-ZERO signatures, not null — exactly what the `when(...).otherwise(0)`
  * fold produced (a null dot product failed every `>= 0` test); a length mismatch
  * vs `dim` is a hard error, matching [[DotProduct]].
  */
case class HyperplaneBands(child: Expression, dim: Int, planes: Int, bands: Int)
    extends UnaryExpression {

  require(dim > 0 && planes > 0 && bands > 0,
    s"${HyperplaneBands.name}: dim/planes/bands must be positive, got ($dim, $planes, $bands)")
  require(planes <= 62, s"${HyperplaneBands.name}: signature must fit a non-negative long")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = HyperplaneBands.name

  /** Never null: null/poisoned inputs produce the all-zero signature array the
    * `when(...).otherwise(0)` fold this replaces produced for them. */
  override def nullable: Boolean = false

  /** Plane matrix flattened to (b * planes + p) * dim + j — one cache-friendly
    * codegen reference object instead of bands×planes literal arrays. */
  @transient private lazy val flatPlanes: Array[Double] =
    HyperplaneBands.flatPlaneMatrix(dim, planes * bands)

  override def eval(input: InternalRow): Any = {
    val sigs = new Array[Long](bands)
    val a = child.eval(input)
    if (a != null) {
      val xs = a.asInstanceOf[ArrayData]
      if (xs.numElements() != dim)
        throw new IllegalArgumentException(
          s"$prettyName: expected $dim elements, got ${xs.numElements()}")
      var j = 0
      var ok = true
      while (ok && j < dim) { if (xs.isNullAt(j)) ok = false; j += 1 }
      if (ok) {
        var b = 0
        while (b < bands * planes) {
          var s = 0.0
          val off = b * dim
          var k = 0
          while (k < dim) { s += xs.getDouble(k) * flatPlanes(off + k); k += 1 }
          // nan-safe >= 0: NaN and -0.0 set the bit, as GreaterThanOrEqual did
          if (!(s < 0.0)) sigs(b / planes) |= 1L << (b % planes)
          b += 1
        }
      }
    }
    UnsafeArrayData.fromPrimitiveArray(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val m = ctx.addReferenceObj("hyperplanes", flatPlanes, "double[]")
    val arr = ctx.freshName("arr")
    val sigs = ctx.freshName("sigs")
    val ok = ctx.freshName("ok")
    val b = ctx.freshName("b")
    val j = ctx.freshName("j")
    val s = ctx.freshName("s")
    val off = ctx.freshName("off")
    val arrayDataCls = classOf[ArrayData].getName
    val unsafeCls = classOf[UnsafeArrayData].getName
    val resultCode =
      code"""
         |${childGen.code}
         |long[] $sigs = new long[$bands];
         |if (!${childGen.isNull}) {
         |  $arrayDataCls $arr = ${childGen.value};
         |  if ($arr.numElements() != $dim) {
         |    throw new IllegalArgumentException(
         |      "${HyperplaneBands.name}: expected $dim elements, got " + $arr.numElements());
         |  }
         |  boolean $ok = true;
         |  for (int $j = 0; $ok && $j < $dim; $j++) {
         |    if ($arr.isNullAt($j)) $ok = false;
         |  }
         |  if ($ok) {
         |    for (int $b = 0; $b < ${bands * planes}; $b++) {
         |      double $s = 0.0;
         |      final int $off = $b * $dim;
         |      for (int $j = 0; $j < $dim; $j++) {
         |        $s += $arr.getDouble($j) * $m[$off + $j];
         |      }
         |      if (!($s < 0.0)) $sigs[$b / $planes] |= 1L << ($b % $planes);
         |    }
         |  }
         |}
         |final $arrayDataCls ${ev.value} = $unsafeCls.fromPrimitiveArray($sigs);
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

object HyperplaneBands {
  val name = "graft_hyperplane_bands"

  /** ±1 hyperplane component for global plane `b`, dimension `j`: bit (j mod 32)
    * of xxhash64(b, j div 32) — fully deterministic, evaluated once on the driver
    * via the same Catalyst hash the engine uses. The SINGLE source of truth for
    * the plane matrix: the compiled kernel's reference object and the DuckDB
    * oracle's literal matrix ([[graft.OracleSql.embedLshTopK]] etc.) are both
    * generated from this function, so drift is impossible. At cluster scale the
    * matrix is "broadcast the random projections" — the standard
    * random-projection-LSH shape. */
  def planeSign(b: Int, j: Int): Double = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64
    val h = XxHash64(Seq(Literal(b.toLong), Literal(j / 32)), 42L)
      .eval(null).asInstanceOf[Long]
    if (((h >> (j % 32)) & 1L) == 1L) 1.0 else -1.0
  }

  private[graft] def flatPlaneMatrix(dim: Int, totalPlanes: Int): Array[Double] = {
    val m = new Array[Double](totalPlanes * dim)
    var b = 0
    while (b < totalPlanes) {
      var j = 0
      while (j < dim) { m(b * dim + j) = planeSign(b, j); j += 1 }
      b += 1
    }
    m
  }

  private[graft] def fromExprs(exprs: Seq[Expression]): HyperplaneBands = {
    require(exprs.length == 4,
      s"$name expects (embedding, dim, planes, bands), got ${exprs.length} arguments")
    def intLit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$name: $what must be an integer literal, got $other")
    }
    HyperplaneBands(exprs.head,
      intLit(exprs(1), "dim"), intLit(exprs(2), "planes"), intLit(exprs(3), "bands"))
  }

  /** Idempotently registers the expression in the session's function registry so
    * it is usable via `call_function(name, emb, dim, planes, bands)` and SQL. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, fromExprs, "built-in")
}
