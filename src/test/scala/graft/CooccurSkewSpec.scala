package graft

import org.apache.spark.sql.functions._

import graft.ops.{Cooccur, SkewProbe}

/** Item co-occurrence (cap contract) and the join-key skew profile. */
class CooccurSkewSpec extends SparkSuite {
  import spark.implicits._

  test("cooccurrence counts users sharing both items; each pair once") {
    val rows = Seq(
      (1L, 10L), (1L, 20L), (1L, 20L), (1L, 30L), // u1: {10,20,30}
      (2L, 10L), (2L, 20L),                       // u2: {10,20}
      (3L, 30L))                                  // u3: no pairs
    val got = Cooccur.itemPairs(rows.toDF("u", "item"), "u", "item", 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((10L, 20L, 2L), (10L, 30L, 1L), (20L, 30L, 1L)))
  }

  test("per-user cap keeps most-interacted items, ties on item id") {
    val rows =
      Seq.fill(3)((1L, 5L)) ++ Seq.fill(3)((1L, 7L)) ++ Seq.fill(2)((1L, 9L))
    // cap 2 → keep {5, 7} (count 3,3; 9 loses with 2); tie 5-vs-7 is moot,
    // but cap 1 must keep 5 (count tie broken on item asc)
    val df = rows.toDF("u", "item")
    val cap2 = Cooccur.itemPairs(df, "u", "item", 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(cap2 === Set((5L, 7L, 1L)))
    assert(Cooccur.itemPairs(df, "u", "item", 1).count() === 0)
  }

  test("hot user emits at most C(cap,2) pairs") {
    val rows = (0 until 200).map(i => (1L, i.toLong))
    val n = Cooccur.itemPairs(rows.toDF("u", "item"), "u", "item", 10).count()
    assert(n === 45) // 10 choose 2, not 200 choose 2
  }

  test("skew profile: exact shares and mean multiples, string-key ties") {
    // key "a"×6, "b"×3, "c"×1 → total 10, n_keys 3
    val rows = Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val got = SkewProbe.keyProfile(rows.toDF("k"), col("k"), topK = 2)
      .as[(Long, String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, "a", 6L, 600L, 180L), // 6/10 = 600‰, 6/(10/3)=1.8× mean
      (2L, "b", 3L, 300L, 90L)))
  }

  test("skew profile top-k plans a TakeOrdered, not a global sort") {
    val df = (1 to 100).map(i => (i % 7).toString).toDF("k")
    val plan = SkewProbe.keyProfile(df, col("k"), topK = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("coedges refuses loudly on a hot key past maxItemsPerKey; override admits") {
    // round-14 explode audit: the grouped pair build materializes
    // k(k-1)/2 structs in ONE row buffer, so an unbounded hot key is an
    // executor OOM, not a slow query — the bounded-k assumption is now a
    // guard (the editDistancePairs pattern), with the itemPairs routing
    // in the message.
    val hot = (1 to 50).map(i => ("k1", i.toLong)) :+ (("k2", 1L))
    val df = hot.toDF("key", "item")
    val e = intercept[Exception] {
      Cooccur.coedges(df, "key", "item", maxItemsPerKey = 20).count()
    }
    val msg = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(10).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msg.contains("maxItemsPerKey") && msg.contains("itemPairs"), msg)
    // wide-enough cap computes all C(50,2) + 0 pairs
    assert(Cooccur.coedges(df, "key", "item", maxItemsPerKey = 64)
      .count() === 50L * 49 / 2)
  }
}
