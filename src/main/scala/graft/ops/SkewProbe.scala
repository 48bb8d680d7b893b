package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-key skew profile — the diagnostic that decides between a plain
  * shuffle join, salting (q40), and AQE skew splitting (q144): per-key row
  * counts for the heaviest keys, each with its exact permille share of
  * the table and its multiple of the mean key load (the quantity AQE's
  * skewedPartitionFactor thresholds against).
  *
  * One groupBy(key) shuffle; the global total and key count ride a 1-row
  * broadcast; the top-k is `orderBy(...).limit(k)` — Spark plans a
  * TakeOrdered (per-partition partial top-k, never a global sort or a
  * one-reducer window), and the rank window then runs over k rows only.
  * All emitted numbers are exact integers — permille and mean-multiple
  * are integer DIV, so the profile is engine-portable.
  */
object SkewProbe {

  def keyProfile(df: DataFrame, keyCol: Column, topK: Int): DataFrame = {
    val counts = df.select(keyCol.cast("string").as("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("_total"),
      count(lit(1)).as("_n_keys"))
    val top = counts.orderBy(col("cnt").desc, col("key")).limit(topK)
    val w = Window.orderBy(col("cnt").desc, col("key")) // over k rows only
    top.crossJoin(broadcast(totals))
      .withColumn("rnk", row_number().over(w))
      .select(col("rnk").cast("long").as("rnk"), col("key"), col("cnt"),
        expr("cnt * 1000 DIV _total").as("permille"),
        // ×100 of the mean key load: cnt / (total / n_keys), integer-exact
        expr("cnt * _n_keys * 100 DIV _total").as("mean_multiple_x100"))
  }
}
