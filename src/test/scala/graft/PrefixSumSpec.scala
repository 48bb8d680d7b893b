package graft

import org.apache.spark.sql.functions._
import graft.ops.PrefixSum

/** Two-pass distributed prefix sum vs a driver-side scan, across
  * partition counts and input orderings.
  */
class PrefixSumSpec extends SparkSuite {
  import spark.implicits._

  test("exclusive prefix matches a sequential scan for any partition count") {
    val rnd = new scala.util.Random(5)
    val rows = rnd.shuffle((1L to 500L).toVector).map(k => (k, rnd.nextInt(50).toLong))
    var acc = 0L
    val expected = rows.sortBy(_._1).map { case (k, v) =>
      val r = (k, acc); acc += v; r
    }.toMap
    for (parts <- Seq(1, 3, 16)) {
      val got = PrefixSum.exclusive(rows.toDF("k", "v").repartition(7),
        "k", "v", "offset", partitions = parts)
        .select("k", "offset").as[(Long, Long)].collect().toMap
      assert(got == expected, s"diverged at partitions=$parts")
    }
  }

  test("empty input yields empty output") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(PrefixSum.exclusive(empty, "k", "v", "offset").count() == 0)
  }
}
