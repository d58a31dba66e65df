package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over word k-shingles as ONE compiled pass per row.
  *
  * Input: the token array. For each sliding window of `shingleSize` tokens
  * the shingle string (tokens joined by ' ') is md5-hashed once, and all
  * `numHashes` affine permutations are folded into running minima:
  *   mh_i = MIN over shingles of ((2i+1)·h + 7919·i) mod P,
  *   h = first-15-hex-digits(md5(shingle)) mod P, P = 2^31-1
  * — bit-identical to the SQL formulation in graft.pipeline.TextOps /
  * the DuckDB oracle (shingle de-dup is skipped: duplicates cannot change
  * a minimum).
  *
  * Why an Expression: the built-in composition (shingle `transform` +
  * nested `transform`/`array_min` per permutation) runs interpreted
  * per-element and re-evaluates the hash array once per permutation after
  * Catalyst collapses the projection into the lambda — measured 16× slower
  * on the documents fixture.
  */
case class MinHashSig(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {

  import org.apache.spark.sql.types._
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null when fewer than k tokens
  override def prettyName: String = "minhash_sig"

  /** Same static kernel from generated code — keeps the signature
    * computation inside whole-stage codegen. */
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.functions.MinHashSig.compute($in, $shingleSize, $numHashes);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], shingleSize, numHashes)

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

object MinHashSig {
  private val space = UTF8String.fromString(" ")

  /** Shared eval/codegen kernel; null when fewer than `shingleSize` tokens. */
  def compute(toks: ArrayData, shingleSize: Int, numHashes: Int): ArrayData = {
    val n = toks.numElements()
    if (n < shingleSize) null
    else {
      val P = graft.pipeline.TextOps.P
      val mins = Array.fill(numHashes)(Long.MaxValue)
      val md = MessageDigest.getInstance("MD5")
      val window = new Array[UTF8String](shingleSize)
      var j = 0
      while (j <= n - shingleSize) {
        var k = 0
        while (k < shingleSize) { window(k) = toks.getUTF8String(j + k); k += 1 }
        md.reset()
        val d = md.digest(UTF8String.concatWs(space, window: _*).getBytes)
        // value of the first 15 hex digits (= first 60 bits, big-endian)
        var h = 0L
        k = 0
        while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        h = (h << 4) | ((d(7) & 0xf0L) >> 4)
        h %= P
        var i = 0
        while (i < numHashes) {
          val v = ((2L * i + 1L) * h + 7919L * i) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
        j += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(mins)
    }
  }
}

/** Rolling polynomial fingerprint of every k-token window (stride 1) as
  * ONE compiled pass per row:
  *   gh_j = Σ_{o=0..k-1} hv(tok_{j+o})·B^o mod P,  B = 131, P = 2^31-1,
  *   hv = first-15-hex-digits(md5(token)) mod P
  * — one short md5 per TOKEN (never a k-token string per window), then
  * O(n·k) multiply-adds. Bit-identical to the DuckDB oracle CTE built
  * from [[graft.pipeline.TextOps.windowCoefSql]].
  *
  * Why an Expression: the built-in formulation (a fold of k zip_with
  * passes over slices of transform(toks, md5)) re-evaluates the per-token
  * hash array inside every nested HOF after Catalyst collapses the
  * projection — measured 5-20× slower than the pre-rolling baseline on
  * the sf0.1 documents fixture, with GC-bound growth across runs.
  *
  * Returns an EMPTY array (not null) when the doc has fewer than k
  * tokens, so posexplode simply emits no windows.
  */
case class RollingWindowHash(child: Expression, windowSize: Int)
    extends UnaryExpression {

  import org.apache.spark.sql.types._
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_window_hash"

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.RollingWindowHash.compute($in, $windowSize);")

  override def nullSafeEval(input: Any): Any =
    RollingWindowHash.compute(input.asInstanceOf[ArrayData], windowSize)

  override protected def withNewChildInternal(c: Expression): RollingWindowHash =
    copy(child = c)
}

object RollingWindowHash {
  /** Shared eval/codegen kernel; empty array when fewer than k tokens. */
  def compute(toks: ArrayData, k: Int): ArrayData = {
    val P = graft.pipeline.TextOps.P
    val n = toks.numElements()
    val out =
      if (n < k) Array.emptyLongArray
      else {
        val md = MessageDigest.getInstance("MD5")
        // per-token hash, computed ONCE per token
        val hv = new Array[Long](n)
        var i = 0
        while (i < n) {
          md.reset()
          val d = md.digest(toks.getUTF8String(i).getBytes)
          var h = 0L
          var b = 0
          while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
          h = (h << 4) | ((d(7) & 0xf0L) >> 4)
          hv(i) = h % P
          i += 1
        }
        val coef = new Array[Long](k)
        coef(0) = 1L
        var o = 1
        while (o < k) { coef(o) = (coef(o - 1) * 131L) % P; o += 1 }
        val gh = new Array[Long](n - k + 1)
        var j = 0
        while (j <= n - k) {
          // each term < P, k·P < 2^36: the pre-mod sum cannot overflow
          var acc = 0L
          o = 0
          while (o < k) { acc += (hv(j + o) * coef(o)) % P; o += 1 }
          gh(j) = acc % P
          j += 1
        }
        gh
      }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

object text {
  /** Column API: minhash_sig(tokens, k, n) → array<long> (null when fewer
    * than k tokens). */
  def minhashSig(tokens: Column, shingleSize: Int, numHashes: Int): Column =
    bridge.column(MinHashSig(bridge.expr(tokens), shingleSize, numHashes))

  /** Column API: rolling_window_hash(tokens, k) → array<long> of per-window
    * fingerprints (empty when fewer than k tokens). */
  def windowHashes(tokens: Column, windowSize: Int): Column =
    bridge.column(RollingWindowHash(bridge.expr(tokens), windowSize))
}
