package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two array<double> columns as a native codegen'd
  * expression — the hot-path primitive for cosine similarity
  * (graft.ops.Similarity). The SQL-functions formulation
  * (`aggregate(zip_with(a, b, *), 0d, +)`) evaluates interpreted (HOFs sit
  * outside whole-stage codegen) and allocates a lambda frame per element;
  * this loop compiles into the generated stage.
  *
  * Summation order is left-to-right — identical to the HOF formulation and
  * to DuckDB's list_dot_product, so swapping it in changes no oracle
  * result bit.
  *
  * Null semantics: null if either side is null (BinaryExpression default);
  * arrays are assumed element-complete (embeddings), mismatched lengths
  * use the shorter prefix.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** Shared by interpreted eval and generated code. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Column API — requires `register(spark)` (or GraftExtensions) first. */
  def vec_dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)

  def register(spark: SparkSession): Unit = {
    DistinctSketch.createIfAbsent(spark, "vec_dot",
      exprs => VectorDot(exprs(0), exprs(1)))
    DistinctSketch.createIfAbsent(spark, "vec_norm",
      exprs => VectorNorm(exprs.head))
  }
}

/** L2 norm of an array<double> column as a native codegen'd expression —
  * completes the all-codegen cosine hot path (norms precomputed once per
  * row via `vec_norm`, pairs scored via `vec_dot`; no interpreted HOF
  * anywhere). Accumulation is a left-to-right sum of squares then sqrt —
  * bit-identical to `sqrt(aggregate(zip_with(v, v, *), 0d, +))`, so
  * swapping it in changes no oracle result. */
case class VectorNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override protected def nullSafeEval(a: Any): Any =
    VectorNorm.norm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorNorm.norm($a)")

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}

object VectorNorm {
  /** Shared by interpreted eval and generated code. */
  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  def vec_norm(v: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_norm", v)
}
