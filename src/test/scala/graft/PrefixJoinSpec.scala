package graft

import org.apache.spark.sql.functions._
import graft.ops.PrefixJoin

/** Prefix-filter join vs the brute-force all-pairs definition. */
class PrefixJoinSpec extends SparkSuite {
  import spark.implicits._

  private def brute(docs: Seq[(Long, String)], theta: Double)
      : Set[(Long, Long)] = {
    val sets = docs.map { case (id, t) =>
      (id, t.split(" ").filter(_.nonEmpty).distinct.toSet)
    }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= theta
    } yield (a, b)).toSet
  }

  private def run(docs: Seq[(Long, String)], theta: Double): Set[(Long, Long)] =
    PrefixJoin.jaccardPairs(docs.toDF("id", "text").repartition(5), "id",
        filter(split(col("text"), " "), t => length(t) > 0), theta)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("random corpora: complete and exact at several thresholds") {
    val rnd = new scala.util.Random(3)
    val vocab = ('a' to 'p').map(_.toString)
    val docs = (1L to 150L).map { i =>
      (i, (0 until 8).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    for (theta <- Seq(0.4, 0.6, 0.8))
      assert(run(docs, theta) === brute(docs, theta), s"theta=$theta")
  }

  test("pairs sharing ONLY frequent tokens are still found or correctly dropped") {
    // 'the' appears everywhere (most frequent → last in rarity order, never
    // in a short prefix); docs 1/2 match only via frequent tokens
    val docs = Seq(
      (1L, "the of and rare1"), (2L, "the of and rare2"),
      (3L, "the of and rare1"), // exact dup of 1
      (4L, "zz yy xx ww")) ++ (5L to 40L).map(i => (i, s"the of and u$i"))
    for (theta <- Seq(0.5, 0.75))
      assert(run(docs, theta) === brute(docs, theta), s"theta=$theta")
  }

  test("exact duplicates always pair (jac = 1.0)") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c"), (4L, "x y z"))
    val got = PrefixJoin.jaccardPairs(docs.toDF("id", "text"), "id",
        split(col("text"), " "), 0.99)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got.values.forall(_ == 1.0))
  }
}
