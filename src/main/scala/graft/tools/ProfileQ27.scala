package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Dedup

/** Dev-only: step-by-step timing of the MinHash+LSH pipeline (round-4
  * fused shape — one native MinHashBandKeys kernel instead of the
  * composed signature → band-keys projections).
  */
object ProfileQ27 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q27] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
      .withColumn("_sh", graft.functions.WordShinglesExpr(col("text"), 2))
    val base = docs.filter(size(col("_sh")) > 0)
      .repartition(32).select(col("doc_id"), col("_sh")).cache()
    t("base count (scan+shingles+spread)")(base.count())
    val sigs = base
      .select(col("doc_id"), col("_sh"),
        posexplode(graft.functions.MinHashBandKeys(col("_sh"), 4, 3, "mh"))
          .as(Seq("band", "bucket")))
      .cache()
    t("fused band keys + explode")(sigs.count())
    val a = sigs.select(col("band"), col("bucket"), col("doc_id").as("id_a"), col("_sh").as("toks_a"))
    val b = sigs.select(col("band"), col("bucket"), col("doc_id").as("id_b"), col("_sh").as("toks_b"))
    val cand = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "toks_a", "toks_b").dropDuplicates("id_a", "id_b").cache()
    t("candidates (bucket join + distinct)")(cand.count())
    val fin = cand.withColumn("jac", Dedup.jaccard(col("toks_a"), col("toks_b")))
      .filter(col("jac") >= 0.5)
    t("verified")(fin.count())
    spark.catalog.clearCache()
    t("full library call, cold cache")(
      Dedup.minhashLshPairs(docs, "doc_id", "_sh", 4, 3, "mh", 0.5).count())
    spark.stop()
  }
}
