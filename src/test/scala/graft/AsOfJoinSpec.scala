package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

/** AsOfJoin.backward vs a brute-force per-row reference on random data:
  * same matches including tie handling, staleness tolerance, and
  * no-prior-match nulls.
  */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(19)
  private val lefts = (0L until 400L).map(i =>
    (i % 7, rnd.nextInt(1000).toLong, i))         // (key, ts, id)
  private val rights = (1000L until 1300L).map(i =>
    (i % 7, rnd.nextInt(1000).toLong, i, s"r$i")) // (key, ts, id, tag)

  private def bruteForce(tolerance: Option[Long]): Map[Long, Option[Long]] =
    lefts.map { case (k, lts, lid) =>
      val candidates = rights.filter { case (rk, rts, _, _) =>
        rk == k && rts <= lts && tolerance.forall(t => lts - rts <= t)
      }
      // latest ts wins; among equal ts, largest tiebreak id wins
      val best = candidates.sortBy { case (_, rts, rid, _) => (rts, rid) }.lastOption
      lid -> best.map(_._3)
    }.toMap

  private def run(tolerance: Option[Long]): Map[Long, Option[Long]] = {
    val l = lefts.toDF("k", "ts", "id")
    val r = rights.toDF("k", "ts", "id", "tag")
    AsOfJoin.backward(l, r, "k", "ts", "id",
      Seq("id" -> "match_id", "tag" -> "match_tag"), tolerance)
      .collect()
      .map(row => row.getAs[Long]("id") ->
        Option(row.getAs[Any]("match_id")).map(_.asInstanceOf[Long]))
      .toMap
  }

  test("backward as-of join matches brute force (no tolerance)") {
    val got = run(None)
    val want = bruteForce(None)
    assert(got.size === lefts.size)
    assert(got === want)
    assert(got.values.exists(_.isEmpty), "fixture should include unmatched lefts")
    assert(got.values.exists(_.nonEmpty))
  }

  test("backward as-of join matches brute force with staleness tolerance") {
    val got = run(Some(50L))
    val want = bruteForce(Some(50L))
    assert(got === want)
    // tolerance must null-out some matches that exist unbounded
    assert(run(None).values.flatten.size > got.values.flatten.size)
  }

  test("NULL attribute on the matched right row stays NULL (no backfill)") {
    // Latest right row (ts=90) has tag = NULL; an older row (ts=80) has a
    // non-null tag. The output must carry (id=30, tag=NULL) — the whole
    // matched row — never mix 30 with the older row's tag.
    val l = Seq((1L, 100L, 10L)).toDF("k", "ts", "id")
    val r = Seq((1L, 90L, 30L, Option.empty[String]),
      (1L, 80L, 29L, Some("stale"))).toDF("k", "ts", "id", "tag")
    val out = AsOfJoin.backward(l, r, "k", "ts", "id",
      Seq("id" -> "match_id", "tag" -> "match_tag")).collect().head
    assert(out.getAs[Long]("match_id") === 30L)
    assert(out.getAs[String]("match_tag") === null)
  }

  private def bruteForceFwd(tolerance: Option[Long]): Map[Long, Option[Long]] =
    lefts.map { case (k, lts, lid) =>
      val candidates = rights.filter { case (rk, rts, _, _) =>
        rk == k && rts >= lts && tolerance.forall(t => rts - lts <= t)
      }
      // earliest ts wins; among equal ts, SMALLEST tiebreak id wins
      val best = candidates.sortBy { case (_, rts, rid, _) => (rts, rid) }.headOption
      lid -> best.map(_._3)
    }.toMap

  private def runFwd(tolerance: Option[Long]): Map[Long, Option[Long]] = {
    val l = lefts.toDF("k", "ts", "id")
    val r = rights.toDF("k", "ts", "id", "tag")
    AsOfJoin.forward(l, r, "k", "ts", "id",
      Seq("id" -> "match_id", "tag" -> "match_tag"), tolerance)
      .collect()
      .map(row => row.getAs[Long]("id") ->
        Option(row.getAs[Any]("match_id")).map(_.asInstanceOf[Long]))
      .toMap
  }

  test("forward as-of join matches brute force (no tolerance and with horizon)") {
    assert(runFwd(None) === bruteForceFwd(None))
    val bounded = runFwd(Some(50L))
    assert(bounded === bruteForceFwd(Some(50L)))
    assert(runFwd(None).values.flatten.size > bounded.values.flatten.size)
  }

  test("forward as-of: a right row AT the left timestamp matches") {
    val l = Seq((1L, 100L, 10L)).toDF("k", "ts", "id")
    val r = Seq((1L, 100L, 30L, Some("now")), (1L, 110L, 31L, Some("later")))
      .toDF("k", "ts", "id", "tag")
    val out = AsOfJoin.forward(l, r, "k", "ts", "id",
      Seq("id" -> "match_id", "tag" -> "match_tag")).collect().head
    assert(out.getAs[Long]("match_id") === 30L)
  }

  test("non-numeric tiebreak column resolves equal-ts ties deterministically") {
    // Two right rows at the same ts; the larger STRING tiebreak must win
    // (pre-fix, the unconditional cast-to-long nulled every string id).
    val l = Seq((1L, 100L, "L1")).toDF("k", "ts", "rid")
    val r = Seq((1L, 90L, "a", "first"), (1L, 90L, "b", "second"))
      .toDF("k", "ts", "rid", "tag")
    val out = AsOfJoin.backward(l, r, "k", "ts", "rid", Seq("tag" -> "match_tag"))
      .collect().head
    assert(out.getAs[String]("match_tag") === "second")
  }

  test("right row exactly at left.ts is visible to that left row") {
    val l = Seq((1L, 100L, 10L)).toDF("k", "ts", "id")
    val r = Seq((1L, 100L, 20L, "exact"), (1L, 99L, 21L, "older")).toDF("k", "ts", "id", "tag")
    val out = AsOfJoin.backward(l, r, "k", "ts", "id", Seq("tag" -> "match_tag"))
      .collect().head
    assert(out.getAs[String]("match_tag") === "exact")
  }
}
