package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot string kernels (SURVEY §2.9:
  * "promote to Catalyst Expression only if benchmarks demand" — promoted
  * here because entity-name formatting sits inside the RDF fan-out, the
  * widest stage of the materialize path).
  *
  * `EntityNameExpr` stays inside whole-stage codegen: `doGenCode` emits a
  * static call on the already-null-checked UTF8String, so the generated
  * loop never falls back to interpreted expression evaluation the way a
  * Scala UDF (with its encoder round-trip) does.
  */
object Expressions {

  /** Static kernel invoked from generated code. */
  def entityNameKernel(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.kg.EntityNames.entityName(s.toString))

  case class EntityNameExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "entity_name"

    override protected def nullSafeEval(input: Any): Any =
      entityNameKernel(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.Expressions.entityNameKernel($c)")

    override protected def withNewChildInternal(newChild: Expression): EntityNameExpr =
      copy(child = newChild)
  }

  /** Column-API form: URI-safe entity name (reference: gkm/features/general.py:8-16).
    * Goes through [[org.apache.spark.sql.GraftColumnBridge]] — Spark 4
    * hid the Column<->Expression converters behind `private[sql]`. */
  def entity_name(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      EntityNameExpr(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** Static dot-product kernel invoked from generated code: one primitive
    * loop over the two UnsafeArrayData buffers. Null on length mismatch or
    * a null element — exactly `aggregate(zip_with(a,b,*),0d,+)` semantics,
    * so the HOF form can swap in anywhere without a result change (same
    * left-to-right fp order). */
  def dotKernel(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    var acc = 0.0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Native codegen'd dot product over two array<double> columns — the hot
    * kernel of every similarity/ANN operator. Versus the higher-order
    * `aggregate(zip_with(...))` form this emits a single primitive loop
    * with no per-element lambda-variable bookkeeping or intermediate
    * array materialization. */
  case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "dot_product"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
    }

    override protected def nullSafeEval(a: Any, b: Any): Any =
      dotKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |java.lang.Double ${ev.value}_r = graft.plans.Expressions.dotKernel($a, $b);
           |if (${ev.value}_r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProductExpr =
      copy(left = newLeft, right = newRight)
  }

  /** Column-API form of the native dot product. */
  def dot_product(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DotProductExpr(org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** Static cosine kernel: ONE loop accumulating dot, |a|² and |b|² —
    * the composed form `dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b)))` walks
    * each array three times. Each accumulator folds left-to-right exactly
    * like its dotKernel counterpart, so the result is bit-identical to the
    * composed form (parity-tested) and to the DuckDB oracle arithmetic. */
  def cosineKernel(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Native codegen'd cosine similarity over two array<double> columns —
    * replaces three array traversals (dot + two norms) with one in the
    * ANN verification/top-k hot paths. */
  case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "cosine_sim"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
    }

    override protected def nullSafeEval(a: Any, b: Any): Any =
      cosineKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |java.lang.Double ${ev.value}_r = graft.plans.Expressions.cosineKernel($a, $b);
           |if (${ev.value}_r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSimExpr =
      copy(left = newLeft, right = newRight)
  }

  /** Column-API form of the native cosine similarity. */
  def cosine_sim(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CosineSimExpr(org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** Static fixed-width histogram kernel: one pass over the bucket-id
    * array, counting ids into a dim-wide double vector. Mirrors the
    * composed form `array((0 until dim).map(d => size(filter(a, _ === d))))`
    * exactly — null ids match no bucket (a null equality is never true in
    * the filter predicate) and out-of-range ids match no bucket — but
    * walks the array ONCE instead of `dim` times. */
  def bucketHistogramKernel(a: ArrayData, dim: Int): ArrayData = {
    val out = new Array[Double](dim)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val b = a.getInt(i)
        if (b >= 0 && b < dim) out(b) += 1.0
      }
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Native codegen'd bucket histogram over an array<int> column — the
    * featurization kernel of the tier-3 cosine alignment (64-dim hashed
    * char-3-gram embeddings, graft.kg.Linker.bucketVector): the composed
    * expression form traverses the bucket array `dim` (=64) times per
    * name; this is O(grams) per name instead of O(dim·grams). */
  case class BucketHistogramExpr(child: Expression, dim: Int) extends UnaryExpression {
    require(dim > 0, s"bucket_histogram needs dim > 0, got $dim")
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "bucket_histogram"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(org.apache.spark.sql.types.IntegerType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket_histogram expects array<int>, got $t")
      }

    override protected def nullSafeEval(input: Any): Any =
      bucketHistogramKernel(input.asInstanceOf[ArrayData], dim)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.Expressions.bucketHistogramKernel($c, $dim)")

    override protected def withNewChildInternal(newChild: Expression): BucketHistogramExpr =
      copy(child = newChild)
  }

  /** Column-API form of the native bucket histogram. */
  def bucket_histogram(buckets: Column, dim: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BucketHistogramExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(buckets), dim))

  /** Register the custom functions for SQL use on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "entity_name", exprs => EntityNameExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProductExpr(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimExpr(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bucket_histogram", exprs => BucketHistogramExpr(exprs.head,
        foldableInt(exprs(1), "bucket_histogram dim")), "scala_udf")
  }

  /** SQL-registration helper: the dim argument must be a foldable,
    * non-null integer literal (the expression is shaped at plan time,
    * like array_repeat's count in practice). Shared by both registration
    * paths; rejects null and non-numeric literals with the same message
    * instead of surfacing a planner NPE/ClassCastException. */
  private[plans] def foldableInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal int")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$what must be a literal int, got $other")
    }
  }
}

/** SparkSessionExtensions hook: `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.plans.GraftExtensions`) makes the custom
  * functions available to every session built from that context. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("entity_name"),
      new ExpressionInfo(classOf[Expressions.EntityNameExpr].getName, "entity_name"),
      (exprs: Seq[Expression]) => Expressions.EntityNameExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[Expressions.DotProductExpr].getName, "dot_product"),
      (exprs: Seq[Expression]) => Expressions.DotProductExpr(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[Expressions.CosineSimExpr].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => Expressions.CosineSimExpr(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("bucket_histogram"),
      new ExpressionInfo(classOf[Expressions.BucketHistogramExpr].getName, "bucket_histogram"),
      (exprs: Seq[Expression]) => Expressions.BucketHistogramExpr(exprs.head,
        Expressions.foldableInt(exprs(1), "bucket_histogram dim"))))
  }
}
