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

/** Nearest-centroid cell id over a FROZEN centroid matrix, as one fused
  * codegen'd kernel: cell = argmin_i (‖c_i‖² − 2·nv·c_i), ties to the
  * lowest index — bit-identical to the `min(struct(d, cell))` broadcast-
  * join argmin and to the unrolled-expression `SemDedup.cellOf` (same
  * ‖c‖² host-side left-fold, same left-to-right dot, same strict-less
  * first-wins tie rule; SemDedupScaleSpec pins the three-way identity).
  *
  * Why it exists (round 10): at k=640 the broadcast-join argmin fans
  * every vector out to k scored rows before a corpus-sized aggregate —
  * measured 31 s for 60 k vectors at sf3, with the fan-out re-executed
  * per consumer of the assignment. This kernel is a plain per-row
  * expression: the k·dim matrix rides the plan as ONE reference object
  * (k=640·dim=64 ≈ 330 KB — broadcast-literal territory), the loop
  * stays inside whole-stage codegen, and no shuffle or fan-out exists
  * at all. At index-serving k (tens of thousands of cells) the matrix
  * is a few tens of MB — still a per-executor constant, the same cost
  * class as a broadcast dimension table.
  *
  * Null semantics: null in → null out (UnaryExpression default). NaN
  * distances never win (strict `<` against a running best), matching
  * the struct-min rule on the fixture domain where NaN cannot occur. */
case class VectorArgminCell(child: Expression,
    cents: Array[Array[Double]], c2: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "vec_argmin_cell"

  override protected def nullSafeEval(a: Any): Any =
    VectorArgminCell.argmin(a.asInstanceOf[ArrayData], cents, c2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val c2Ref = ctx.addReferenceObj("c2", c2, "double[]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorArgminCell.argmin($a, $centsRef, $c2Ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): VectorArgminCell =
    copy(child = newChild)
}

object VectorArgminCell {
  /** Shared by interpreted eval and generated code. */
  def argmin(a: ArrayData, cents: Array[Array[Double]], c2: Array[Double]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val n = math.min(a.numElements(), c.length)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += a.getDouble(j) * c(j); j += 1 }
      val d = c2(i) - 2.0 * dot
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Column API. The centroid matrix is expression STATE, not a child
    * column, so the registry entry is created per matrix (named by k +
    * content hash; the builder closure captures the arrays) — same
    * createIfAbsent idempotence as every other graft function. ‖c‖² is
    * folded HERE, host-side, left-to-right — the single shared fold
    * every argmin form uses. */
  def vec_argmin_cell(spark: SparkSession, nv: Column,
      cents: Array[Array[Double]]): Column = {
    val c2 = cents.map(_.map(x => x * x).sum)
    val name = "vec_argmin_cell_" + cents.length + "_" +
      java.lang.Integer.toHexString(
        java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]]))
    DistinctSketch.createIfAbsent(spark, name,
      exprs => VectorArgminCell(exprs.head, cents, c2))
    org.apache.spark.sql.functions.call_function(name, nv)
  }
}
