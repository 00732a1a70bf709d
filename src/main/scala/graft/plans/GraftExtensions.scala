package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.ArrayType

import graft.expr.{DotProduct, HyperplaneBands, MinHashSig, RollingHash, ShingleHashSet, SimHash64, SortedIntersectCount}

/** Library installation point — the idiomatic way a Spark-native engine ships its
  * Catalyst extensions (no per-query `register()` calls):
  *
  * {{{
  *   spark.sql.extensions=graft.plans.GraftExtensions       // config, or
  *   SparkSession.builder().withExtensions(new GraftExtensions) // programmatic
  * }}}
  *
  * Installs:
  *  - the [[graft.expr.SortedIntersectCount]] expression under
  *    `sorted_intersect_count`, [[graft.expr.DotProduct]] under `graft_dot`,
  *    [[graft.expr.HyperplaneBands]] under `graft_hyperplane_bands`,
  *    [[graft.expr.RollingHash]] under `graft_rolling_hash`,
  *    [[graft.expr.SimHash64]] under `graft_simhash64`,
  *    [[graft.expr.ShingleHashSet]] under `graft_shingle_set`, and
  *    [[graft.expr.MinHashSig]] under `graft_minhash_sig` in every session's
  *    function registry (usable from SQL text and `call_function`);
  *  - [[IntersectionNonEmptyToOverlap]], an optimizer rule that strength-reduces
  *    full-intersection emptiness tests to short-circuiting overlap probes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(SortedIntersectCount.name),
      new ExpressionInfo(classOf[SortedIntersectCount].getCanonicalName,
        SortedIntersectCount.name),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(DotProduct.name),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, DotProduct.name),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(HyperplaneBands.name),
      new ExpressionInfo(classOf[HyperplaneBands].getCanonicalName,
        HyperplaneBands.name),
      (exprs: Seq[Expression]) => HyperplaneBands.fromExprs(exprs)))
    ext.injectFunction((
      FunctionIdentifier(RollingHash.name),
      new ExpressionInfo(classOf[RollingHash].getCanonicalName, RollingHash.name),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier(SimHash64.name),
      new ExpressionInfo(classOf[SimHash64].getCanonicalName, SimHash64.name),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier(ShingleHashSet.name),
      new ExpressionInfo(classOf[ShingleHashSet].getCanonicalName, ShingleHashSet.name),
      (exprs: Seq[Expression]) => ShingleHashSet.fromExprs(exprs)))
    ext.injectFunction((
      FunctionIdentifier(MinHashSig.name),
      new ExpressionInfo(classOf[MinHashSig].getCanonicalName, MinHashSig.name),
      (exprs: Seq[Expression]) => MinHashSig.fromExprs(exprs)))
    ext.injectOptimizerRule(_ => IntersectionNonEmptyToOverlap)
  }
}

/** Rewrites `size(array_intersect(a, b)) > 0` to `arrays_overlap(a, b)` (and
  * `size(...) <= 0` to its negation): `arrays_overlap` short-circuits on the first
  * common element, while `array_intersect` materializes the full distinct
  * intersection before the size test — on adjacency-sized arrays (O(√m) under the
  * orientation invariant) that is the difference between a probe and a build.
  *
  * Guarded on `containsNull = false` element types: with null elements,
  * `arrays_overlap` returns null where `size(...) > 0` returns false — the rewrite
  * would change results. Null top-level arrays agree in both forms (null → null).
  *
  * Also guarded on `spark.sql.legacy.sizeOfNull = false` (round-2 advice): under
  * the legacy flag `size(null)` is -1, so `size(array_intersect(null, b)) > 0`
  * is false and `<= 0` is TRUE where the rewritten overlap forms yield null — a
  * semantics change the element-level guard cannot see.
  */
object IntersectionNonEmptyToOverlap extends Rule[LogicalPlan] {

  private def nonNullElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (org.apache.spark.sql.internal.SQLConf.get.legacySizeOfNull) plan
    else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThan(Size(ArrayIntersect(a, b), _), Literal(0, _))
        if nonNullElems(a) && nonNullElems(b) =>
      ArraysOverlap(a, b)
    case LessThan(Literal(0, _), Size(ArrayIntersect(a, b), _))
        if nonNullElems(a) && nonNullElems(b) =>
      ArraysOverlap(a, b)
    case LessThanOrEqual(Size(ArrayIntersect(a, b), _), Literal(0, _))
        if nonNullElems(a) && nonNullElems(b) =>
      Not(ArraysOverlap(a, b))
    case EqualTo(Size(ArrayIntersect(a, b), _), Literal(0, _))
        if nonNullElems(a) && nonNullElems(b) =>
      Not(ArraysOverlap(a, b))
  }
}
