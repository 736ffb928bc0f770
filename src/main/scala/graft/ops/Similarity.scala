package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: the brute-force path is the correctness baseline (one pass,
  * no shuffle besides the final top-k); the IVF path is the 10^12-row shape —
  * a coarse quantizer splits the corpus into clusters, the query probes only
  * `nprobe` clusters, so the scan touches nprobe/k of the data. Here the
  * coarse assignment comes from the corpus `label` column (stand-in for a
  * trained k-means codebook — training one is out of scope; the *plumbing*
  * — centroid table, probe-then-scan plan, partition pruning by cluster —
  * is the real thing).
  *
  * Dot products use `zip_with` + `aggregate` higher-order functions: pure
  * Catalyst expressions, no UDF, no per-row JVM boxing beyond the array.
  */
object Similarity {

  /** Dot product as a Column — the native codegen'd Catalyst expression
    * (graft.plans.Expressions.DotProductExpr): one primitive loop in the
    * generated code, no intermediate zip array. Identical semantics and
    * fp-fold order to `aggregate(zip_with(a,b,*), 0d, +)` (parity-tested
    * in ExpressionsSpec), which remains below as the composed-HOF fallback
    * for engines without the extension. */
  def dot(a: Column, b: Column): Column =
    graft.plans.Expressions.dot_product(a, b)

  /** Composed higher-order-function form of [[dot]]. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine top-k of `embeddings` vs the row with vec_id = queryId.
    * Output: (vec_id, cos_sim rounded) ordered desc. */
  def bruteTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q"))
    embeddings.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("embedding"), col("q")) /
          (norm(col("embedding")) * norm(col("q"))), 4).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_id"))
      .limit(k)
  }

  /** Centroid table of the coarse quantizer: avg vector per cluster.
    * `samplePermille` < 1000 computes centroids from a deterministic
    * hash-keyed sample of the corpus — the 10^12-row path, where
    * posexploding every vector for an average is needless (centroid
    * estimates converge long before full coverage; the sample key is a
    * content hash so results are reproducible across runs/engines). */
  def centroids(embeddings: DataFrame, samplePermille: Int = 1000): DataFrame = {
    val base =
      if (samplePermille >= 1000) embeddings
      else embeddings.filter(pmod(xxhash64(col("vec_id")), lit(1000)) < samplePermille)
    val dim = base
      .select(posexplode(col("embedding")).as(Seq("pos", "v")), col("label"))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v")).as("c"))
    dim.groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label"), transform(col("pc"), x => x.getField("c")).as("centroid"))
  }

  /** IVF-style search: probe the `nprobe` closest centroids, scan only
    * their clusters, return top-k by cosine. */
  def ivfTopK(embeddings: DataFrame, queryId: Long, k: Int, nprobe: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q"))
    val probed = centroids(embeddings)
      .crossJoin(broadcast(q))
      .select(col("label"),
        round(dot(col("centroid"), col("q")) /
          (norm(col("centroid")) * norm(col("q"))), 4).as("c_sim"))
      .orderBy(desc("c_sim"), col("label"))
      .limit(nprobe)
      .select("label")
    embeddings.filter(col("vec_id") =!= queryId)
      .join(broadcast(probed), "label") // cluster pruning: only probed cells scanned
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(dot(col("embedding"), col("q")) /
          (norm(col("embedding")) * norm(col("q"))), 4).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_id"))
      .limit(k)
  }

  /** Embedding near-duplicate pairs via random-hyperplane LSH — the
    * 10^12-row shape: no all-pairs join anywhere in the plan.
    *
    *  1. signature: bit h = sign(v . hyperplane_h). Hyperplanes are the
    *     first `numHyperplanes` corpus vectors (deterministic and
    *     reproducible in any engine; a production run would use seeded
    *     Gaussian planes — only the anchor table changes).
    *  2. banding: the signature splits into `bands` equal bit-groups;
    *     vectors sharing ANY band's bit-pattern become candidates — an
    *     equi-join on (band, band_sig), exactly the MinHash-LSH trick.
    *  3. verify: exact cosine >= minCos on candidates only.
    *
    * The only crossJoin is against the broadcast `numHyperplanes`-row
    * anchor table (bounded by construction). */
  def lshNearDup(embeddings: DataFrame, numHyperplanes: Int, bands: Int,
                 minCos: Double): DataFrame = {
    val rows = numHyperplanes / bands
    val e = embeddings.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    val anchors = e.filter(col("vec_id") < numHyperplanes)
      .select(col("vec_id").as("h_id"), col("embedding").as("hyper"))
    val bits = e.crossJoin(broadcast(anchors))
      .select(col("vec_id"), (col("h_id") / rows).cast("int").as("band"), col("h_id"),
        when(dot(col("embedding"), col("hyper")) >= 0, lit("1")).otherwise(lit("0")).as("bit"))
    val sigs = bits.groupBy("vec_id", "band")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("h_id"), col("bit")))),
        x => x.getField("bit")), "").as("band_sig"))
    val cand = sigs.as("a").join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.band_sig") === col("b.band_sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("nrm").as("nrm_a")), "id_a")
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("nrm").as("nrm_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }
}
