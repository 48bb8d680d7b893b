package graft

import org.apache.spark.sql.functions._
import graft.ops.CountMin

/** Count-min sketch properties against exact counts: never undercounts,
  * overcount bounded by the collision mass, and heavy hitters estimated
  * exactly at this corpus/width ratio.
  */
class CountMinSpec extends SparkSuite {
  import spark.implicits._

  private val depth = 4
  private val width = 1024
  private val seed = "cms1"

  // Zipf-ish corpus: term t_i appears ~ 3000/i times
  private val corpus: Seq[String] =
    (1 to 200).flatMap(i => Seq.fill(3000 / i)(s"t$i"))

  test("estimates never undercount and stay within the epsilon bound") {
    val terms = corpus.toDF("term")
    val sk = CountMin.sketch(terms, "term", depth, width, seed)
      .persist()
    val exact = terms.groupBy("term").agg(count(lit(1)).as("true_count"))
    val est = CountMin.estimate(sk, exact.select("term"), "term", depth, width, seed)
    val joined = est.join(exact, "term")
      .select("term", "est_count", "true_count")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(joined.nonEmpty)
    val total = corpus.size.toLong
    // classic CMS bound: overcount ≤ e/width · total with prob 1 - e^-depth;
    // use 3× slack so the test is deterministic-safe at depth 4
    val bound = math.ceil(3.0 * math.E / width * total).toLong
    joined.foreach { case (t, est, tru) =>
      assert(est >= tru, s"$t undercounted: $est < $tru")
      assert(est - tru <= bound, s"$t overcounted: $est vs $tru (bound $bound)")
    }
    // the top-10 heavy hitters are estimated exactly at this load factor
    joined.sortBy(-_._3).take(10).foreach { case (t, est, tru) =>
      assert(est == tru, s"heavy hitter $t: $est != $tru")
    }
    // unseen terms estimate at most the collision bound (usually 0)
    val unseen = CountMin.estimate(sk, Seq("never_seen").toDF("term"),
      "term", depth, width, seed).collect()
    assert(unseen.head.getLong(1) <= bound)
    sk.unpersist()
  }

  test("sketch size is depth x width cells at most, regardless of vocabulary") {
    val sk = CountMin.sketch(corpus.toDF("term"), "term", depth, width, seed)
    assert(sk.count() <= depth.toLong * width)
  }
}
