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

object text {
  /** Column API: minhash_sig(tokens, k, n) → array<long> (null when fewer
    * than k tokens). */
  def minhashSig(tokens: Column, shingleSize: Int, numHashes: Int): Column =
    bridge.column(MinHashSig(bridge.expr(tokens), shingleSize, numHashes))
}
