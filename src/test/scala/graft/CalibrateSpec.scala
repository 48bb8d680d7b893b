package graft

import graft.ops.Calibrate

/** Quantile normalization vs a sequential reference. */
class CalibrateSpec extends SparkSuite {
  import spark.implicits._

  private def ref(rows: Seq[(Long, String, Long)]): Map[Long, Long] = {
    val pooled = rows.map(r => (r._3, r._1)).sorted.map(_._1)
    val n = pooled.size
    rows.groupBy(_._2).flatMap { case (_, g) =>
      val sorted = g.sortBy(r => (r._3, r._1))
      sorted.zipWithIndex.map { case (r, i) =>
        val pr = if (sorted.size == 1) 0.0 else i.toDouble / (sorted.size - 1)
        r._1 -> pooled(math.floor(pr * (n - 1) + 0.5).toInt)
      }
    }
  }

  test("normalized scores equal the sequential reference") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 200L).map { i =>
      val src = s"s${i % 4}"
      // source-dependent shift: s0 scores low, s3 scores high
      (i, src, (rnd.nextInt(100) + (i % 4) * 300).toLong)
    }
    val got = Calibrate.quantileNormalize(
        rows.toDF("id", "src", "score").repartition(7), "id", "src", "score")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === ref(rows))
  }

  test("group extremes map to pooled extremes") {
    val rows = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 1000L), (4L, "b", 2000L))
    val got = Calibrate.quantileNormalize(rows.toDF("id", "src", "score"),
        "id", "src", "score")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // each group's min → global min (10), each group's max → global max (2000):
    // after calibration, a's best and b's best are comparable
    assert(got(1L) === 10L && got(3L) === 10L)
    assert(got(2L) === 2000L && got(4L) === 2000L)
  }
}
