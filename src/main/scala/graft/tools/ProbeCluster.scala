package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeCluster {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, dir)
      .withColumn("_toks", array_distinct(graft.functions.TextAnalysis.tokens(col("text"))))
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.jaccardPairs(docs, "doc_id", "_toks",
      expr("n_chars DIV 64"), 0.6, subBlocks = 0)
      .localCheckpoint()
    println(f"[probe] pairs: ${pairs.count()} in ${(System.nanoTime()-t0)/1e9}%.2f s")
    // per-iteration timing of the propagation loop, hand-unrolled
    val t1 = System.nanoTime()
    val labels = graft.ops.Cluster.labelPropagation(pairs, "id_a", "id_b")
    println(f"[probe] propagation total: ${labels.count()} labels in ${(System.nanoTime()-t1)/1e9}%.2f s")
    val t2 = System.nanoTime()
    val labels2 = graft.ops.Cluster.alternatingStar(pairs, "id_a", "id_b")
    println(f"[probe] star total: ${labels2.count()} labels in ${(System.nanoTime()-t2)/1e9}%.2f s")
    // cluster stats
    labels.groupBy("cluster").count().agg(count(lit(1)), max("count"), avg("count")).show()
    spark.stop()
  }
}
