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
    if (args.headOption.contains("cap")) {
      // Near-cap probe for the round-14 coedges guard: 8 hot keys at
      // k items each — k(k−1)/2 structs materialize in ONE row buffer
      // per key before the explode, so this measures the worst buffer
      // the default cap admits (k=2048 ≈ 2.1M structs ≈ 32 MB/row) and
      // confirms the raise just past it.
      import spark.implicits._
      def hot(k: Int) = spark.range(8L * k).select(
        (col("id") % 8).cast("string").as("k"), (col("id") / 8).as("p"))
      for (k <- Seq(512, 1024, 2048)) {
        for (i <- 1 to 2) {
          val t0 = System.nanoTime()
          val n = graft.ops.Cooccur.coedges(hot(k), "k", "p").count()
          println(f"[cap] k=$k run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n edges)")
        }
      }
      val raised = try { graft.ops.Cooccur.coedges(hot(2049), "k", "p").count(); false }
        catch { case e: Throwable =>
          Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
            .take(10).exists(t => Option(t.getMessage).exists(_.contains("maxItemsPerKey"))) }
      println(s"[cap] k=2049 raises with named knob: $raised")
      spark.stop(); return
    }
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
