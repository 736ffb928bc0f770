package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-range join via bin bucketing — the scalable shape for
  * "timestamp falls inside an interval" joins.
  *
  * A naive `p.ts BETWEEN r.start AND r.end` theta join has no equi keys,
  * so Spark plans a per-key cartesian (or a broadcast nested loop). The
  * bucketing trick restores an equi-join: every range explodes into the
  * fixed-width epoch bins it covers (`sequence` — ranges are short
  * relative to the bin width, so the fan-out is a small constant), every
  * point lands in exactly one bin, the join runs on (key, bin), and the
  * exact range predicate filters bin-edge false positives. Shuffle is
  * O(|points| + |ranges| · bins-per-range), never |points| × |ranges|.
  */
object RangeJoin {

  /** @param points  one row per point; must contain `key` and `ptsCol`
    * @param ranges  one row per range; must contain `key`, `startCol`,
    *                `endCol`; column names must not clash with `points`
    *                (project before calling)
    * @param maxBinsPerRange fail-fast bound on the per-range explode
    *                fan-out: a `binSeconds` far smaller than the range
    *                widths would silently amplify the ranges side by the
    *                ratio and OOM a task — instead the task raises with an
    *                explicit message naming the misconfiguration. */
  def pointsInRanges(points: DataFrame, ranges: DataFrame, key: String,
                     ptsCol: String, startCol: String, endCol: String,
                     binSeconds: Long, maxBinsPerRange: Int = 4096): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    def bin(c: Column): Column = (unix_timestamp(c) / binSeconds).cast("long")
    val p = points.withColumn("_bin", bin(col(ptsCol)))
    val nBins = bin(col(endCol)) - bin(col(startCol)) + 1
    val guard = when(nBins > maxBinsPerRange,
      raise_error(concat(lit(s"range join fan-out: a range covers "), nBins,
        lit(s" bins of $binSeconds s (> $maxBinsPerRange) — raise binSeconds or maxBinsPerRange"))))
    val r = ranges.withColumn("_bin",
      explode(coalesce(guard.cast("array<bigint>"),
        sequence(bin(col(startCol)), bin(col(endCol))))))
    p.join(r, Seq(key, "_bin"))
      .filter(col(ptsCol) >= col(startCol) && col(ptsCol) <= col(endCol))
      .drop("_bin")
  }
}
