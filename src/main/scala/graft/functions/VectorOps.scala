package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * oracle's list_dot_product. Both implement `doGenCode`, so the n² pair
  * filter stays inside one WholeStageCodegen span (no fallback boxing in
  * the hot loop).
  */
private object VecEval {
  def toDouble(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType  => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType   => arr.getLong(i).toDouble
    case ByteType   => arr.getByte(i).toDouble
    case ShortType  => arr.getShort(i).toDouble
    case _ => throw new IllegalArgumentException(s"bad element type $et")
  }

  /** Java source for reading element `idx` of `arr` as double. */
  def access(arr: String, idx: String, et: DataType): String = et match {
    case FloatType   => s"(double)$arr.getFloat($idx)"
    case DoubleType  => s"$arr.getDouble($idx)"
    case IntegerType => s"(double)$arr.getInt($idx)"
    case LongType    => s"(double)$arr.getLong($idx)"
    case ByteType    => s"(double)$arr.getByte($idx)"
    case ShortType   => s"(double)$arr.getShort($idx)"
    case other => throw new IllegalArgumentException(s"bad element type $other")
  }
}

/** Deterministic pseudo-random hyperplane components shared by the
  * interpreted and generated code paths (called from generated Java via
  * the static forwarder). splitmix64 finalizer — stable in [-1, 1). */
object LshPlanes {
  def component(p: Int, j: Int): Double = {
    var z = (p.toLong << 32) ^ j.toLong ^ 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    z.toDouble / Long.MaxValue.toDouble
  }
}

/** dot(a, b) with sequential double accumulation. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
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

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${VecEval.access(l, i, leftElem)} *
         |          ${VecEval.access(r, i, rightElem)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

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
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lsh_sign_bits"
  require(numBits <= 32)

  private lazy val elem = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    var bits = 0
    var p = 0
    while (p < numBits) {
      var dot = 0d
      var j = 0
      while (j < dim) {
        dot += VecEval.toDouble(v, j, elem) * LshPlanes.component(p, j)
        j += 1
      }
      if (dot >= 0) bits |= (1 << p)
      p += 1
    }
    bits
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val dim = ctx.freshName("dim")
      val bits = ctx.freshName("bits")
      val dot = ctx.freshName("dot")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      s"""
         |int $dim = $v.numElements();
         |int $bits = 0;
         |for (int $p = 0; $p < $numBits; $p++) {
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    $dot += ${VecEval.access(v, j, elem)} *
         |            graft.functions.LshPlanes.component($p, $j);
         |  }
         |  if ($dot >= 0) $bits |= (1 << $p);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

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
