package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, StringType}
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

  /** Register `entity_name` for SQL use on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "entity_name", exprs => EntityNameExpr(exprs.head), "scala_udf")
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
  }
}
