package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.SlidingAgg

/** Sliced trailing-window decomposition vs the global RANGE window it
  * must equal, with boundary-straddling frames exercised on purpose.
  */
class SlidingAggSpec extends SparkSuite {
  import spark.implicits._

  private def global(df: org.apache.spark.sql.DataFrame, lookback: Long) = {
    val w = Window.partitionBy("k").orderBy("ts")
      .rangeBetween(-lookback, 0)
    df.withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_win", sum(col("v")).over(w))
  }

  test("matches the global RANGE window across slice boundaries") {
    // slice = 100, lookback = 40: rows sit right at / around boundaries
    val rows = Seq(
      ("a", 0L, 1L), ("a", 59L, 2L), ("a", 61L, 4L), ("a", 99L, 8L),
      ("a", 100L, 16L), ("a", 101L, 32L), ("a", 139L, 64L), ("a", 141L, 128L),
      ("a", 200L, 256L), ("b", 95L, 1L), ("b", 105L, 2L))
    val df = rows.toDF("k", "ts", "v")
    val got = SlidingAgg.trailing(df, "k", col("ts"), col("v"), 40L, 100L)
      .select("k", "ts", "v", "n_win", "sum_win")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val want = global(df, 40L)
      .select("k", "ts", "v", "n_win", "sum_win")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    // boundary spot checks: 101 sees {61,99,100,101}; 100 sees {61,99,100}
    assert(got.contains(("a", 101L, 32L, 4L, 60L)))
    assert(got.contains(("a", 100L, 16L, 3L, 28L)))
    // cross-key isolation: b@105 sees b@95 via the replica, not any a row
    assert(got.contains(("b", 105L, 2L, 2L, 3L)))
  }

  test("seeded random log matches the global window; ties share frames") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map { _ =>
      (Seq("x", "y", "z")(rnd.nextInt(3)), rnd.nextLong(2000L),
        rnd.nextLong(100L))
    }
    val df = rows.toDF("k", "ts", "v") // duplicate ts values are likely
    val got = SlidingAgg.trailing(df, "k", col("ts"), col("v"), 150L, 300L)
      .groupBy("k", "ts").agg(sum("n_win").as("n"), sum("sum_win").as("s"))
      .as[(String, Long, Long, Long)].collect().toSet
    val want = global(df, 150L)
      .groupBy("k", "ts").agg(sum("n_win").as("n"), sum("sum_win").as("s"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("sliceUs below lookbackUs is rejected") {
    val df = Seq(("a", 1L, 1L)).toDF("k", "ts", "v")
    intercept[IllegalArgumentException] {
      SlidingAgg.trailing(df, "k", col("ts"), col("v"), 100L, 50L)
    }
  }
}
