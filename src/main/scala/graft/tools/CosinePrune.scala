package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: measure the recall/cost trade of the tier-3 cosine
  * hyperplane-LSH prune (graft.kg.Linker.alignCosine(lshPrune = _)) against
  * the full broadcast scan, on the same head-skewed open-vocabulary shape
  * FuzzySkew uses (every name shares the " formation" suffix, so the gram
  * histograms are dominated by a common direction — the HARD case for
  * sign-LSH separation, which is exactly what a measurement should stress).
  *
  * Reports, per mode: scored candidate pairs (full scan = |probes|·|dict|;
  * pruned = rows out of cosineLshCandidates — the shuffle/score volume the
  * prune exists to cut), wall seconds, links found, and agreement — how
  * many of the full scan's linked names the pruned mode links to the SAME
  * canonical (a differing winner is still a ≥ minSim match, but counts
  * against agreement). args: [nUnlinked] [nDict] [planes] [bands]
  * (defaults 2000, 2000, 64, 8 — the PLANS.md recommended operating
  * point; 2-bit bands like (16,8) measure as worthless). */
object CosinePrune {
  def main(args: Array[String]): Unit = {
    val nUnlinked = args.headOption.map(_.toInt).getOrElse(2000)
    val nDict = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val planes = args.drop(2).headOption.map(_.toInt).getOrElse(64)
    val bands = args.drop(3).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.kg.{Linker, Model}

    val alias = spark.range(nDict)
      .select(concat(lit("unit"), col("id"), lit(" formation")).as("alias_norm"))
      .withColumn("canonical", initcap(col("alias_norm")))
      .unionByName(Seq(("waldron shale", "Waldron Shale")).toDF("alias_norm", "canonical"))
      .withColumn("kind", lit(Model.ObjKind.Strat))
      .cache()
    alias.count()
    val aligned = spark.range(nUnlinked)
      .select(concat(lit("unit"), col("id"), lit(" Formatoin")).as("obj_name"))
      .unionByName(Seq("Waldron Shael").toDF("obj_name"))
      .withColumn("obj_kind", lit(Model.ObjKind.Strat))
      .withColumn("obj_canonical", col("obj_name"))
      .withColumn("obj_linked", lit(false))
      .cache()
    aligned.count()

    // candidate volume the prune achieves, measured directly over the
    // engine's OWN featurization (shared helpers — no drift possible)
    val unlinked = Linker.cosineUnlinked(aligned)
    val dict = Linker.cosineDict(alias)
    val fullPairs = (nUnlinked + 1).toLong * (nDict + 1)
    val prunedPairs = Linker.cosineLshCandidates(unlinked, dict, planes, bands).count()
    println(f"dict=$nDict unlinked=$nUnlinked planes=$planes bands=$bands | " +
      f"pairs full=$fullPairs pruned=$prunedPairs (${100.0 * prunedPairs / fullPairs}%.1f%%)")

    def links(df: org.apache.spark.sql.DataFrame): Map[String, String] =
      df.filter(col("obj_linked")).select("obj_name", "obj_canonical")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    var fullLinks = Map.empty[String, String]
    for ((label, prune) <- Seq("full-scan" -> None,
                               s"lsh($planes,$bands)" -> Some((planes, bands)))) {
      val t0 = System.nanoTime()
      val out = links(Linker.alignCosine(aligned, alias, lshPrune = prune))
      val secs = (System.nanoTime() - t0) / 1e9
      if (prune.isEmpty) fullLinks = out
      val agree = out.count { case (n, c) => fullLinks.get(n).contains(c) }
      val rec = if (fullLinks.isEmpty) 1.0 else agree.toDouble / fullLinks.size
      println(f"$label%-12s linked=${out.size}%-8d agree=$agree%-8d " +
        f"recall=$rec%.3f waldron=${out.getOrElse("Waldron Shael", "-")}%-16s wall=$secs%.2f s")
    }
    spark.stop()
  }
}
