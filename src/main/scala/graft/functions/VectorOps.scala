package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math for embedding columns.
  *
  * The `functions.aggregate(zip_with(...))` formulation is semantically
  * right but evaluates a boxed lambda per element — at n² pair volume that
  * dominates the whole similarity stage. These expressions run one tight
  * primitive loop per row over the ArrayData, with the SAME sequential
  * double accumulation (index order, double precision), so results are
  * bit-identical to the higher-order-function version and to the DuckDB
  * oracle's list_dot_product.
  */
private object VecEval {
  def toDouble(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType  => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType   => arr.getLong(i).toDouble
    case _ => throw new IllegalArgumentException(s"bad element type $et")
  }
}

/** dot(a, b) with sequential double accumulation. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private lazy val leftElem =
    left.dataType.asInstanceOf[ArrayType].elementType
  private lazy val rightElem =
    right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0d
    var i = 0
    while (i < n) {
      acc += VecEval.toDouble(a, i, leftElem) * VecEval.toDouble(b, i, rightElem)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Packed sign-LSH signature: `numBits` pseudo-random hyperplanes whose
  * components derive from a splittable 64-bit mix of (bit, component) —
  * deterministic, no RNG state, no driver-side plane materialization.
  * One pass computes all bits; callers slice the returned Int into bands.
  */
case class LshSignBits(child: Expression, numBits: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lsh_sign_bits"
  require(numBits <= 32)

  private lazy val elem = child.dataType.asInstanceOf[ArrayType].elementType

  /** splitmix64 finalizer — stable plane components in [-1, 1). */
  private def planeComponent(p: Int, j: Int): Double = {
    var z = (p.toLong << 32) ^ j.toLong ^ 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    var bits = 0
    var p = 0
    while (p < numBits) {
      var dot = 0d
      var j = 0
      while (j < dim) {
        dot += VecEval.toDouble(v, j, elem) * planeComponent(p, j)
        j += 1
      }
      if (dot >= 0) bits |= (1 << p)
      p += 1
    }
    bits
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignBits =
    copy(child = newChild)
}

object VectorOps {
  def dot(a: Column, b: Column): Column =
    GraftColumns.ofExpr(DotProduct(GraftColumns.exprOf(a), GraftColumns.exprOf(b)))

  def normSq(a: Column): Column = dot(a, a)

  def lshSignBits(v: Column, numBits: Int): Column =
    GraftColumns.ofExpr(LshSignBits(GraftColumns.exprOf(v), numBits))
}
