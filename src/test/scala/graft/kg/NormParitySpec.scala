package graft.kg

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The driver-side normalization used by the canonicalizer's local
  * union-find fast path MUST equal Linker.normName's Catalyst expression on
  * every input, or the local and distributed CC paths diverge silently. */
class NormParitySpec extends SparkSpec {
  import spark.implicits._

  test("normLocal == Linker.normName on adversarial inputs (seeded)") {
    val atoms = Array("Abbey", "head", "BED.", "..", " ", "\t", "St.",
      "Peter", "O'Brien", "a  b", ".", "X.", "Formation.", "", "MiXeD")
    val rnd = new scala.util.Random(11)
    val inputs = (Seq.fill(300) {
      Seq.fill(rnd.nextInt(5) + 1)(atoms(rnd.nextInt(atoms.length)))
        .mkString(if (rnd.nextBoolean()) " " else "")
    } ++ atoms).distinct.filter(_.nonEmpty)

    val sparkSide = inputs.toDF("n")
      .select(col("n"), Linker.normName(col("n")).as("norm"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    inputs.foreach { in =>
      assert(sparkSide(in) === Canonicalizer.normLocal(in), s"divergence on '$in'")
    }
  }
}
