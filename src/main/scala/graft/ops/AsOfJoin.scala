package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — attach to every left row the single most
  * recent right row with `right.ts <= left.ts` in the same key group.
  *
  * Spark has no built-in as-of operator; the scalable composition is ONE
  * union + ONE window pass:
  *
  *   1. tag left (side=1) and right (side=0) rows, union them,
  *   2. sort within each key partition by (ts, side) — a right row at the
  *      exact left timestamp sorts first, giving `<=` semantics,
  *   3. `last(right_payload, ignoreNulls)` over rows unbounded-preceding
  *      carries the latest right payload forward,
  *   4. keep the left rows.
  *
  * Cost is one shuffle on the key + a sort — O(n log n) per key group —
  * versus the O(|L|·|R|)-per-key range join a naive
  * `left.ts >= right.ts` theta-join plans as. Right rows are first-hit
  * deduped per (key, ts) by `tieCol` so the carried payload is
  * deterministic under timestamp ties.
  */
object AsOfJoin {

  /** @param right   must contain key, ts, tieCol and `payload` columns
    * @param payload right columns to attach (null when no prior right row)
    */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
               tieCol: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // deterministic single right row per (key, ts)
    val wTie = Window.partitionBy(col(key), col(ts)).orderBy(col(tieCol))
    val r = right
      .withColumn("_rn", row_number().over(wTie)).filter(col("_rn") === 1)
      .select(Seq(col(key), col(ts)) ++ payload.map(col): _*)

    val rTagged = r.select(
      Seq(col(key), col(ts), lit(0).as("_side"),
        struct(payload.map(col): _*).as("_payload")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      Seq(col(key), col(ts), lit(1).as("_side"),
        lit(null).cast(rTagged.schema("_payload").dataType).as("_payload")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col): _*)

    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"_asof.$p").as(p)): _*)
  }
}
