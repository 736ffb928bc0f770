package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Entity canonicalization via connected components over a candidate-pair
  * edge Dataset (BASELINE.json north_star; SURVEY.md §7.2 step 6).
  *
  * The reference's only canonicalization is the per-name alignment swap
  * (J2); connected components generalizes it: surface forms that link to
  * the same canonical, share a normalized form, or are aliased transitively
  * collapse into one cluster with a single deterministic canonical id.
  *
  * Algorithm: distributed min-label propagation expressed as DataFrame
  * joins — labels(v) := min(labels(v), min over neighbors) each round,
  * converging in O(graph diameter) rounds. Entity-alias graphs are star
  * shaped (surface form → normalized form → canonical), diameter <= 4, so
  * this outperforms the O(log^2 n)-round large-star/small-star scheme while
  * shuffling strictly less per round; every round localCheckpoints to
  * truncate lineage so Catalyst never re-analyzes a growing plan tree.
  * Driver holds only the convergence flag — no collected data.
  *
  * Ids are xxhash64 of (kind, surface form) — content-derived, so results
  * are reproducible across runs and cluster sizes (no uuid4, SURVEY §7.4).
  */
object Canonicalizer {

  /** Connected components by min-label propagation.
    * @param edges0 (src:long, dst:long) undirected candidate pairs
    * @return (id, component) for every id appearing in an edge;
    *         component = min member id of the cluster. */
  def connectedComponents(edges0: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = {
      val e = edges0.select(col("src").cast("long"), col("dst").cast("long"))
        .filter(col("src") =!= col("dst"))
      e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)

    var iter = 0
    var converged = sym.isEmpty
    while (!converged && iter < maxIter) {
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("component"))
      val next = labels.unionAll(msgs)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint(true)
      // converged iff no label strictly decreased this round
      val changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.component") < col("o.component"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist(false)
    labels
  }

  /** Canonical-name table for the aligned triples: every distinct
    * (kind, surface form) gets a `canonical_name` — the lexicographically
    * smallest clustered surface form (deterministic tie-break) — and a
    * stable `entity_cluster_id`.
    *
    * Edges: surface form — its normalized-form pseudo-node (normalization
    * identity), and alignment swaps surface — canonical. Pseudo-nodes never
    * become canonical names because canonical selection runs over real
    * surface forms only. */
  def canonicalize(aligned: DataFrame): DataFrame = {
    def nid(kindCol: Column, nameCol: Column): Column = xxhash64(kindCol, nameCol)

    val names = aligned.select(col("obj_kind").as("kind"), col("obj_name").as("name"))
      .unionAll(aligned.select(col("obj_kind").as("kind"), col("obj_canonical").as("name")))
      .distinct()
      .withColumn("norm", Linker.normName(col("name")))

    val vertices = names
      .withColumn("id", nid(col("kind"), col("name")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val normEdges = vertices.select(
      col("id").as("src"),
      nid(col("kind"), concat(lit("norm:"), col("norm"))).as("dst"))
    val alignEdges = aligned
      .filter(col("obj_linked"))
      .select(nid(col("obj_kind"), col("obj_name")).as("src"),
              nid(col("obj_kind"), col("obj_canonical")).as("dst"))
      .distinct()

    val comp = connectedComponents(normEdges.unionAll(alignEdges))

    val withComp = vertices.join(comp, Seq("id"), "left")
      .withColumn("component", coalesce(col("component"), col("id")))
    val canon = withComp.groupBy(col("component"))
      .agg(min(struct(col("name"))).as("c"))
      .select(col("component"), col("c.name").as("canonical_name"))
    val out = withComp.join(canon, "component")
      .select(col("kind"), col("name"), col("canonical_name"),
              col("component").as("entity_cluster_id"))
    vertices.unpersist(false)
    out
  }

  /** Join the canonical table back onto aligned triples, adding
    * `obj_final` (the cluster-canonical name) and `entity_cluster_id`. */
  def apply(aligned: DataFrame): DataFrame = {
    val canon = canonicalize(aligned)
    // no broadcast hint: the canonical table is |distinct surface forms| —
    // small here, potentially huge at web scale. AQE picks broadcast when
    // runtime stats allow and a shuffle join otherwise.
    aligned.join(
      canon.withColumnRenamed("kind", "c_kind").withColumnRenamed("name", "c_name"),
      col("obj_kind") === col("c_kind") && col("obj_canonical") === col("c_name"),
      "left")
      .withColumn("obj_final", coalesce(col("canonical_name"), col("obj_canonical")))
      .drop("c_kind", "c_name", "canonical_name")
  }
}
