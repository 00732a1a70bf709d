package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared integer-hash kernels for the text operators.
  *
  * Both expressions compute the SAME DuckDB-reproducible polynomial rolling hash
  * (acc·31 + codepoint, mod 1e9+7, from 0) the interpreted
  * `aggregate(transform(split(s, ''), ascii), …)` fold computed — per CODE POINT,
  * exactly as `split('')` + `ascii()` saw the string (a surrogate pair is one
  * element to Java's code-point-aware regex split, and `ascii` returns its code
  * point). All arithmetic is non-negative before each mod, so `%` == `pmod` and
  * there is no float anywhere — cross-engine exactness is unconditional.
  *
  * Codegen emits one CALL to the expression instance (shipped as a codegen
  * reference object) rather than inlining the string loop: the loop runs as
  * JIT-compiled bytecode — same machine code for the interpreted and codegen
  * paths, so the two can never diverge — and the generated method stays tiny (no
  * Janino pressure, the whole stage keeps compiling however many of these the
  * plan stacks). */
object TextHash {
  val Mod = 1000000007L

  /** Rolling hash of one string's code points; "" → 0 (the fold's seed — the old
    * form hashed `[""]` with ascii('')=0 to the same value). */
  def rollingHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var k = 0
    while (k < str.length) {
      val cp = str.codePointAt(k)
      h = (h * 31 + cp) % Mod
      k += Character.charCount(cp)
    }
    h
  }
}

/** `graft_rolling_hash(str)` — the [[TextHash.rollingHash]] polynomial fold as a
  * compiled scalar, replacing the interpreted per-character
  * `aggregate`/`transform`/`split('')` HOF chain in
  * [[graft.docs.TextOps.fingerprint]] and
  * [[graft.Ingest.participantIdPortable]]. Null string → null, matching the
  * fold's null propagation. */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = RollingHash.name
  override def nullable: Boolean = child.nullable

  def compute(s: UTF8String): Long = TextHash.rollingHash(s)

  override protected def nullSafeEval(s: Any): Any =
    compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollingHash", this, classOf[RollingHash].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val name = "graft_rolling_hash"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => RollingHash(exprs.head), "built-in")
}

/** `graft_simhash64(tokens)` — 64-bit SimHash of a token array in ONE compiled
  * pass, replacing the interpreted two-level fold in [[graft.docs.Dedup.simhash]]
  * (per-token `aggregate` over `split('')` chars, then an O(tokens × 64)
  * `aggregate`/`zip_with` vote accumulation — Spark never compiles higher-order
  * functions, so the entire signature ran interpreted with per-token
  * `sequence(0, 63)` array allocations).
  *
  * Semantics are the old form's, bit for bit: empty AND null tokens are skipped
  * (the `filter(x -> x != '')` / null-predicate drop), each surviving token gets
  * the [[TextHash.rollingHash]] code-point hash, bit i's vote is the parity of
  * (h·(2i+1) + (i·2654435761 mod p)) mod p, and bit i is set when its vote sum
  * is strictly positive. Empty token array → 0L. Null ARRAY → null (the fold's
  * null propagation through `split(lower(null))`). Integer-only arithmetic:
  * h < 1e9, h·127 + p fits a long with 10³ headroom. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = SimHash64.name
  override def nullable: Boolean = child.nullable

  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val tok = tokens.getUTF8String(t)
        if (tok.numBytes() > 0) {
          val h = TextHash.rollingHash(tok)
          var i = 0
          while (i < 64) {
            val key = (h * (2 * i + 1) + SimHash64.bitSalt(i)) % TextHash.Mod
            votes(i) += (if ((key & 1L) == 1L) 1 else -1)
            i += 1
          }
        }
      }
      t += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) bits |= 1L << i
      i += 1
    }
    bits
  }

  override protected def nullSafeEval(tokens: Any): Any =
    compute(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  val name = "graft_simhash64"

  /** (i · 2654435761) mod p for i in 0..63 — the per-bit affine re-mix constant
    * of the fold this replaces, precomputed once. */
  private[expr] val bitSalt: Array[Long] =
    Array.tabulate(64)(i => (i * 2654435761L) % TextHash.Mod)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => SimHash64(exprs.head), "built-in")
}
