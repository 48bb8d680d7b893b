package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q154 edge-build experiment: the co-occurrence edge list (parts sharing
  * an order) via (a) the self-join on the order key vs (b) one groupBy +
  * per-row sorted-pair explosion. Same output; (b) trades the two-sided
  * join shuffle for one aggregation + O(k²) per-row array work.
  */
object EdgeBuildProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
    def t(name: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[edge] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n edges)")
      }
    }
    t("(a) self-join") {
      li.as("a").join(li.as("b"),
          col("a.k") === col("b.k") && col("a.p") < col("b.p"))
        .select(col("a.p").as("src"), col("b.p").as("dst"))
        .distinct().count()
    }
    t("(b) groupBy + pair explosion") {
      val grouped = li.groupBy("k").agg(
        sort_array(collect_set(col("p"))).as("ps"))
      grouped.select(explode(expr(
          "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS src, y AS dst))))"))
          .as("e"))
        .select(col("e.src"), col("e.dst"))
        .distinct().count()
    }
    spark.stop()
  }
}
