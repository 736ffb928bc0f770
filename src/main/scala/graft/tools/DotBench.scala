package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: native DotProductExpr vs the aggregate(zip_with) HOF form on
  * the embedding-similarity kernel (all-pairs within the LSH candidate
  * shape, sf0.1 embeddings). */
object DotBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.embeddings(spark, sfDir)
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("embedding")).cache()
    e.count()
    val l = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val r = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = l.join(r, pmod(col("ia") + col("ib"), lit(7)) === 0 && col("ia") < col("ib"))
      .cache()
    println(s"[dot] pairs=${pairs.count()}")
    def time(name: String)(c: org.apache.spark.sql.Column): Unit = {
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        pairs.select(sum(c)).collect()
        if (i > 0) println(f"[dot] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("hof   ")(graft.ops.Similarity.dotHof(col("ea"), col("eb")))
    time("native")(graft.plans.Expressions.dot_product(col("ea"), col("eb")))
    // cosine: composed (3 array passes) vs single-pass native kernel
    import graft.plans.Expressions.{dot_product => dp}
    time("cos3  ")(dp(col("ea"), col("eb")) /
      (sqrt(dp(col("ea"), col("ea"))) * sqrt(dp(col("eb"), col("eb")))))
    time("cos1  ")(graft.plans.Expressions.cosine_sim(col("ea"), col("eb")))

    // tier-3 featurization kernel: composed dim×filter/size histogram vs
    // the one-pass native BucketHistogramExpr, over synthetic names
    import graft.kg.Linker
    val names = spark.range(200000)
      .select(concat(lit("unit"), col("id"), lit(" formation")).as("n"))
      .withColumn("bks", Linker.gramBuckets(Linker.normName(col("n"))))
      .cache()
    println(s"[hist] names=${names.count()}")
    def timeH(name: String)(c: org.apache.spark.sql.Column): Unit = {
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        names.select(sum(element_at(c, 1))).collect()
        if (i > 0) println(f"[hist] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    timeH("hof   ")(Linker.bucketVectorHof(col("bks")))
    timeH("native")(Linker.bucketVector(col("bks")))
    spark.stop()
  }
}
