package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local MinHash preparation kernels.
  *
  * Round 6's minhash profile at sf0.1 put ~85% of the warm `minhash_lsh_pairs`
  * time in the PREP stages: `posexplode` materializing one row per character
  * position, a `collect_set` ObjectHashAggregate + exchange building the per-doc
  * hash sets, then a re-explode + 64-`min` HashAggregate + exchange for the
  * signatures. Every hash in both stages derives from the document's OWN text,
  * so none of it needs a shuffle: these two expressions compute the sorted
  * distinct shingle-hash set and the permutation minima per ROW, keeping the
  * whole preparation map-side (the first exchange left in the pipeline is the
  * band-bucket self-join — the one that genuinely needs to move data). At the
  * 100 TB design point that removes two corpus-sized aggregation exchanges.
  *
  * Bit-for-bit contract with the aggregate forms they replace (pinned by
  * MinHashKernelSpec differentials, reconstructed verbatim from
  * [[graft.docs.Dedup.shingleHashes]] which stays in production for the
  * per-shingle contamination scan): same ~60-bit double rolling hash per
  * k-code-point shingle, same `sort_array(collect_set(x))` ordering, same
  * `min(pmod(xp·(2i+1) + b_i, p))` minima. Codegen ships one CALL per row to
  * the JIT-compiled kernel (the TextHash pattern) — eval and codegen share one
  * implementation and the generated method stays tiny at any (k, perms). */
object MinHashKernel {
  val P1 = 1000000007L
  val P2 = 1000000009L

  /** Code points of `s`, as `String.codePointAt` would see them (a surrogate
    * pair is one element). Valid UTF-8 — the only thing a parquet/JSON scan
    * produces — is decoded straight off the bytes (no `toString`, no `char[]`
    * copy, no per-window re-walk); anything `UTF8String.isValid` rejects falls
    * back to the legacy BYTE-WALK decode (numBytesForFirstByte boundaries,
    * per-char `substring(i,1).toString.codePointAt(0)`) so malformed bytes
    * keep the exact hashes of the pre-kernel `ascii(substring(...))` pipeline
    * and of [[graft.docs.Dedup.shingleHashes]]. */
  private def codePoints(s: UTF8String): Array[Int] = {
    if (s.isValid) {
      val b = s.getBytes
      val cps = new Array[Int](s.numChars())
      var ci = 0
      var i = 0
      while (i < b.length) {
        val b0 = b(i) & 0xff
        if (b0 < 0x80) { cps(ci) = b0; i += 1 }
        else if (b0 < 0xe0) {
          cps(ci) = ((b0 & 0x1f) << 6) | (b(i + 1) & 0x3f); i += 2
        } else if (b0 < 0xf0) {
          cps(ci) = ((b0 & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f); i += 3
        } else {
          cps(ci) = ((b0 & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
            ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f); i += 4
        }
        ci += 1
      }
      cps
    } else {
      // Malformed bytes (isValid false): reproduce the LEGACY byte-walk
      // windowing — per-"char" `ascii(substring(text, i, 1))` semantics, where
      // the walk advances by numBytesForFirstByte (a truncated lead byte like
      // 0xE2 swallows the following bytes as one char). The previous fallback
      // decoded the WHOLE string via toString (0xE2 becomes one U+FFFD and the
      // swallowed bytes survive as their own chars), so shingleSets diverged
      // from shingleHashes — still in production for the contamination scan —
      // on malformed-but-reachable input (round-6 advice, verified
      // empirically: 'abc'+0xE2+'defgh' gave 3 legacy windows vs 5 kernel
      // windows with different hashes). MinHashKernelSpec now carries a REAL
      // legacy-vs-kernel differential on invalid bytes.
      val n = s.numChars()
      val cps = new Array[Int](n)
      var i = 0
      while (i < n) {
        val ch = s.substring(i, i + 1).toString
        cps(i) = if (ch.isEmpty) 0 else ch.codePointAt(0)
        i += 1
      }
      cps
    }
  }

  /** Combined shingle hashes of every k-code-point window, sorted distinct —
    * exactly `sort_array(collect_set(shingleHash(...)))` over the posexplode'd
    * windows. Fewer than k code points → empty array (the pipeline's
    * `length(text) >= k` guard makes such rows unreachable in production).
    *
    * The window hashes ROLL: h(i+1) = (h(i) − cp(i)·31^(k−1))·31 + cp(i+k),
    * all mod p — exact modular arithmetic, so the values are bit-identical to
    * the direct per-window loop (and to the aggregate forms the kernel spec
    * differentials against) at 2 multiplies per position instead of 2k. */
  def shingleSet(s: UTF8String, k: Int): Array[Long] = {
    val cps = codePoints(s)
    val n = cps.length - k + 1
    if (n <= 0) return Array.emptyLongArray
    // 31^(k-1) mod P1 and 131^(k-1) mod P2 for the outgoing code point
    var pow1 = 1L
    var pow2 = 1L
    var j = 1
    while (j < k) { pow1 = pow1 * 31 % P1; pow2 = pow2 * 131 % P2; j += 1 }
    var h1 = 0L
    var h2 = 0L
    j = 0
    while (j < k) {
      val cp = cps(j)
      h1 = (h1 * 31 + cp) % P1
      h2 = (h2 * 131 + cp) % P2
      j += 1
    }
    val hs = new Array[Long](n)
    hs(0) = h1 * P2 + h2
    var i = 1
    while (i < n) {
      val out = cps(i - 1)
      val in = cps(i + k - 1)
      // cp·pow < 2^51, so the subtraction never overflows; floorMod re-centers
      h1 = (java.lang.Math.floorMod(h1 - out * pow1, P1) * 31 + in) % P1
      h2 = (java.lang.Math.floorMod(h2 - out * pow2, P2) * 131 + in) % P2
      hs(i) = h1 * P2 + h2
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 1
    i = 1
    while (i < n) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    if (w == n) hs else java.util.Arrays.copyOf(hs, w)
  }
}

/** `graft_shingle_set(text, k)` — the per-document sorted distinct shingle-hash
  * array as ONE compiled scalar: replaces `posexplode` + rolling-hash projection
  * + `sort_array(collect_set(x))` (an ObjectHashAggregate and its exchange) in
  * [[graft.docs.Dedup.shingleSets]]. Null text → null. */
case class ShingleHashSet(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, s"${ShingleHashSet.name}: k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = ShingleHashSet.name
  override def nullable: Boolean = child.nullable

  def compute(s: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(MinHashKernel.shingleSet(s, k))

  override protected def nullSafeEval(s: Any): Any =
    compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleSet", this, classOf[ShingleHashSet].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

object ShingleHashSet {
  val name = "graft_shingle_set"

  private[graft] def fromExprs(exprs: Seq[Expression]): ShingleHashSet = {
    require(exprs.length == 2, s"$name expects (text, k), got ${exprs.length} arguments")
    exprs(1) match {
      case Literal(v: Int, IntegerType) => ShingleHashSet(exprs.head, v)
      case other => throw new IllegalArgumentException(
        s"$name: k must be an integer literal, got $other")
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, fromExprs, "built-in")
}

/** `graft_minhash_sig(xs, perms)` — the `perms` permutation minima
  * `min((x mod p)·(2i+1) + b_i mod p)` over a hash array in ONE compiled pass:
  * replaces the re-explode + `perms` plain `min` aggregates (a HashAggregate and
  * its exchange) in the signature stage of [[graft.docs.Dedup.minhashLshPairs]].
  * Offsets b_i come from [[graft.docs.Dedup.minhashOffsets]] — the same literal
  * table the DuckDB oracle renders. Null array → null; null elements are skipped
  * (`min` ignores null rows); an array with no non-null element is a hard error
  * (the aggregate form emitted no row at all for it — there is no value this
  * expression could return without silently changing that contract, and the
  * pipeline's `length(text) >= k` guard means no such row reaches it). */
case class MinHashSig(child: Expression, perms: Int) extends UnaryExpression {

  require(perms > 0, s"${MinHashSig.name}: perms must be positive, got $perms")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<long> argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = MinHashSig.name
  override def nullable: Boolean = child.nullable

  @transient private lazy val offsets: Array[Long] =
    graft.docs.Dedup.minhashOffsets(perms).toArray

  def compute(xs: ArrayData): ArrayData = {
    val p = MinHashKernel.P1
    val sig = new Array[Long](perms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = xs.numElements()
    var any = false
    var t = 0
    while (t < n) {
      if (!xs.isNullAt(t)) {
        any = true
        val xp = java.lang.Math.floorMod(xs.getLong(t), p)
        var i = 0
        while (i < perms) {
          val v = (xp * (2L * i + 1) + offsets(i)) % p
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      t += 1
    }
    if (!any) throw new IllegalArgumentException(
      s"$prettyName: no non-null elements — the min aggregates this replaces emitted no row here")
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def nullSafeEval(xs: Any): Any =
    compute(xs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val name = "graft_minhash_sig"

  private[graft] def fromExprs(exprs: Seq[Expression]): MinHashSig = {
    require(exprs.length == 2, s"$name expects (xs, perms), got ${exprs.length} arguments")
    exprs(1) match {
      case Literal(v: Int, IntegerType) => MinHashSig(exprs.head, v)
      case other => throw new IllegalArgumentException(
        s"$name: perms must be an integer literal, got $other")
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, fromExprs, "built-in")
}
