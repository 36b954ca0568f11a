package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import java.security.MessageDigest

/** 64-bit SimHash over a token array, as a native Catalyst expression.
  *
  * Design for scale: SimHash is a pure per-row computation — one pass over
  * the tokens, no shuffle, no UDF-serialization overhead — so the whole
  * dedup-signature stage stays narrow and pipelined inside the scan stage.
  * Each token is hashed with MD5 (first 64 bits); bit b of the signature is
  * 1 iff the sum over tokens of ±1 (by token-bit b) is positive. Output is
  * the 16-hex-char signature, so results are portable across engines (the
  * DuckDB oracle recomputes it from `md5()` in SQL).
  *
  * `doGenCode` emits a direct static call into [[SimHash64.compute]], so
  * the signature stage stays inside whole-stage codegen (no fallback row
  * boxing); the digest instance is thread-local, not per-row.
  *
  * Near-dup pairing then happens by banding the 64 bits (pigeonhole over 4
  * blocks finds all pairs within Hamming distance 3 without an O(n²) join).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  import org.apache.spark.sql.GraftColumns

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** The per-row kernel; called from generated code via the static
    * forwarder. */
  def compute(arr: ArrayData): UTF8String = {
    val acc = new Array[Int](64)
    val md = digest.get()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        md.reset()
        val dig = md.digest(bytes)
        // first 8 bytes, big-endian, = first 16 hex chars of md5 hex
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
        var bit = 0
        while (bit < 64) {
          // bit 0 = most significant, matching hex-string order
          if (((h >>> (63 - bit)) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    val out = new Array[Char](16)
    var d = 0
    while (d < 16) {
      var v = 0
      var j = 0
      while (j < 4) {
        if (acc(d * 4 + j) > 0) v |= (1 << (3 - j))
        j += 1
      }
      out(d) = java.lang.Character.forDigit(v, 16)
      d += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** Column API: simhash of an `array<string>` token column. */
  def simhash64(tokens: Column): Column =
    GraftColumns.ofExpr(SimHash64(GraftColumns.exprOf(tokens)))

  /** Hamming distance between two 16-hex-char signatures — nibble-wise
    * bit_count over built-ins (codegen-friendly, no UDF). */
  def hammingHex(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    val nibbles = (0 until 16).map { i =>
      bit_count(
        conv(substring(a, i + 1, 1), 16, 10).cast("int")
          .bitwiseXOR(conv(substring(b, i + 1, 1), 16, 10).cast("int")))
    }
    nibbles.reduce(_ + _)
  }
}
