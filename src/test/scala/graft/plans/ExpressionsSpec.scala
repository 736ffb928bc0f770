package graft.plans

import graft.SparkSpec
import graft.kg.EntityNames
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("EntityNameExpr equals the Scala kernel on fixture names") {
    val names = Seq("Waldron Shale", " Powell – Smithville – Black Rock ",
      "o'brien", "St. Peter Sandstone", "Agrinierite")
    val got = names.toDF("n")
      .select(Expressions.entity_name(col("n")))
      .collect().map(_.getString(0))
    assert(got.toSeq === names.map(EntityNames.entityName))
  }

  test("null-safe and registered for SQL use") {
    Expressions.register(spark)
    val got = Seq(Some("gold ore"), None).toDF("n")
      .selectExpr("entity_name(n) AS e")
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq === Seq(Some("GoldOre"), None))
  }

  test("stays inside whole-stage codegen (no UDF eval node)") {
    // spark.range feeds a codegen'd stage (a literal LocalRelation would
    // collapse to LocalTableScan with no codegen at all)
    val plan = spark.range(10).select(col("id").cast("string").as("n"))
      .select(Expressions.entity_name(col("n")))
      .queryExecution.executedPlan.toString
    // "*(1)" marks operators fused into WholeStageCodegen stage 1
    assert(plan.contains("*(1) Project [entity_name("), plan)
    assert(!plan.toLowerCase.contains("udf"), plan)
  }

  test("GraftExtensions injects the function into a fresh builder") {
    val ext = new GraftExtensions
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext(e) // must register without throwing
  }
}
