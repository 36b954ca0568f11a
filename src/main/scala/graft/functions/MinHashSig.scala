package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Full MinHash signature over a shingle-hash array, as a native Catalyst
  * expression.
  *
  * Design for scale: the MinHash signature is a pure PER-ROW computation
  * over the document's (already 64-bit-hashed) shingle set, so there is no
  * reason to explode shingles and run `numHashes` min-aggregations through
  * a shuffle — one pass here computes all `numHashes` minima in a tight
  * primitive loop that stays inside whole-stage codegen. The k-th hash of
  * a shingle is derived from its 8-byte base hash (`XXH64.hashLong(h0, k)`)
  * rather than re-hashing the string per seed — same banding math, k×
  * cheaper (mirrors the reference's single-digest derivation trick).
  *
  * Cited behavior: MinHash/LSH banding per Broder '97 and MMDS ch.3 —
  * public algorithms; the reference engine exposes comparable dedup via
  * its plugin surface (see SURVEY §2 extensions).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import org.apache.spark.sql.GraftColumns

  /** One pass over the base-hash array; all `k` minima at once. Called
    * from generated code via the static forwarder. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val h0 = arr.getLong(i)
      var j = 0
      while (j < k) {
        val h = XXH64.hashLong(h0, j)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Column API: MinHash signature (`array<long>` of length `numHashes`)
    * of an `array<long>` base-hash column. */
  def minhashSig(baseHashes: Column, numHashes: Int): Column =
    GraftColumns.ofExpr(MinHashSig(GraftColumns.exprOf(baseHashes), numHashes))
}
