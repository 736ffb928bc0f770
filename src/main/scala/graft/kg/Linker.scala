package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity linking against the known-entity dictionary (SURVEY.md J2).
  *
  * The reference embeds the extracted object name with a sentence
  * transformer and swaps it for the argmax-cosine known entity iff
  * similarity >= 0.95, else keeps the original
  * (reference: text2graph/alignment.py:110-119; applied at llm.py:234-245).
  * The >=0.95 regime is, observationally, normalization-level equality —
  * the reference's own tests exercise exactly that:
  * "Abbey head bed." → "Abbey Head Bed", "Gold" → "gold"
  * (reference: tests/test_alignment.py:7-23). We therefore link by a
  * deterministic normalized-key join (BASELINE.json north_star mandates the
  * broadcast alias dictionary + salted-key skew-safe hash join; embedding
  * weights are nondeterministic and the binaries are absent from the repo).
  *
  * Two physical strategies, same semantics:
  *  - [[align]]: broadcast hash join — the right plan while the dictionary
  *    is dictionary-sized (~52k names ≈ few MB). Broadcast joins cannot
  *    skew regardless of probe-side key distribution.
  *  - [[alignSalted]]: shuffle hash join with explicit key salting for the
  *    case where the dictionary outgrows broadcast (e.g. cross-lingual
  *    alias tables at web scale). Head entities ("Minnesota"-type keys,
  *    SURVEY.md §4) would make single reducers hot; salting the probe key
  *    with pmod(xxhash64(url), S) and replicating the build side S times
  *    bounds any reducer at 1/S of a hot key.
  */
object Linker {

  /** Normalization defining the high-confidence match regime: lowercase,
    * trim, strip trailing sentence periods, collapse whitespace. */
  def normName(c: Column): Column =
    regexp_replace(regexp_replace(lower(trim(c)), "\\.+$", ""), "\\s+", " ")

  /** Alias dictionary from the dim snapshot: canonical names + long-form
    * aliases, discriminated by entity type. One row per (norm key, kind),
    * first-hit deduped so the join can never fan out
    * (reference first-hit semantics: text2graph/schema.py:141 hit[0]). */
  def aliasDim(dims: Dims.Snapshot): DataFrame = {
    // Both the short and the long form are known-entity names in their own
    // right (the reference's 45,646-name list mixes them); a swap targets
    // the matched *name*, exactly like the embedding argmax returns a name
    // from the list ("Abbey head bed." → "Abbey Head Bed",
    // tests/test_alignment.py:8-10).
    val strat = dims.stratDim.select(
      col("strat_name").as("alias"), col("strat_name").as("canonical"),
      lit(Model.ObjKind.Strat).as("kind"), col("strat_name_id").as("priority"))
    val stratLong = dims.stratDim.select(
      col("strat_name_long").as("alias"), col("strat_name_long").as("canonical"),
      lit(Model.ObjKind.Strat).as("kind"), col("strat_name_id").as("priority"))
    val minerals = dims.mineralDim.select(
      col("mineral").as("alias"), col("mineral").as("canonical"),
      lit(Model.ObjKind.Mineral).as("kind"), col("mineral_id").as("priority"))
    val liths = dims.lithDim.select(
      col("lith").as("alias"), col("lith").as("canonical"),
      lit(Model.ObjKind.Lith).as("kind"), col("lith_id").as("priority"))
    val usgs = {
      val spark = dims.mineralDim.sparkSession
      import spark.implicits._
      Chem.UsgsFormulas.keys.toSeq.sorted.toDF("alias")
        .select(col("alias"), col("alias").as("canonical"),
          lit(Model.ObjKind.Mineral).as("kind"), lit(999999L).as("priority"))
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("kind"), col("alias_norm"))
      .orderBy(col("priority"), col("alias"))
    strat.unionByName(stratLong).unionByName(minerals).unionByName(liths)
      .unionByName(usgs)
      .withColumn("alias_norm", normName(col("alias")))
      .filter(col("alias_norm") =!= "")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("alias_norm", "canonical", "kind")
  }

  /** Broadcast alignment join. Adds `obj_canonical` (swapped on match, the
    * original extracted name otherwise — reference keeps the raw name below
    * threshold, llm.py:242-245) and `obj_linked` (whether a swap happened).
    */
  def align(triples: DataFrame, alias: DataFrame): DataFrame = {
    val a = broadcast(alias.withColumnRenamed("kind", "alias_kind"))
    triples
      .withColumn("obj_norm", normName(col("obj_name")))
      .join(a, col("obj_norm") === a("alias_norm") &&
                col("obj_kind") === a("alias_kind"), "left")
      .withColumn("obj_canonical", coalesce(col("canonical"), col("obj_name")))
      .withColumn("obj_linked", col("canonical").isNotNull)
      .drop("alias_norm", "canonical", "alias_kind", "obj_norm")
  }

  /** Skew-safe shuffle variant: salt the probe key S ways, replicate the
    * build side S times, join on (key, salt). Identical output to [[align]].
    */
  def alignSalted(triples: DataFrame, alias: DataFrame, saltBuckets: Int = 16): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val salts = (0 until saltBuckets).toDF("salt")
    val build = alias.withColumnRenamed("kind", "alias_kind")
      .crossJoin(salts) // S replicas of the dictionary
    val probe = triples
      .withColumn("obj_norm", normName(col("obj_name")))
      .withColumn("salt", pmod(xxhash64(col("url")), lit(saltBuckets)).cast("int"))
    probe
      .hint("shuffle_hash")
      .join(build,
        probe("obj_norm") === build("alias_norm") &&
          probe("obj_kind") === build("alias_kind") &&
          probe("salt") === build("salt"), "left")
      .withColumn("obj_canonical", coalesce(col("canonical"), col("obj_name")))
      .withColumn("obj_linked", col("canonical").isNotNull)
      .drop("alias_norm", "canonical", "alias_kind", "obj_norm")
      .drop(probe("salt")).drop(build("salt"))
  }
}
