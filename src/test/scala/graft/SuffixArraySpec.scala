package graft

import org.apache.spark.sql.functions._
import graft.ops.{PrefixSum, SuffixArray}

/** Suffix-array repeat profile vs an exhaustive O(n²) reference. */
class SuffixArraySpec extends SparkSuite {
  import spark.implicits._

  private val maxLen = 16
  private val dupLen = 8

  /** All word-start offsets (1-based), single-space contract. */
  private def starts(text: String): Seq[Int] = {
    var pos = 1
    text.split(" ", -1).flatMap { w =>
      val s = if (w.nonEmpty) Some(pos) else None
      pos += w.length + 1
      s
    }.toSeq
  }

  private def lcpRef(a: String, b: String): Int =
    a.zip(b).takeWhile { case (x, y) => x == y }.size

  /** Exhaustive reference: for each suffix, max LCP against EVERY other
    * suffix in the corpus (not just SA-adjacent ones).
    */
  private def profileRef(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long)] = {
    val sfx = for {
      (id, text) <- docs
      off <- starts(text)
    } yield (id, off, text.substring(off - 1).take(maxLen))
    val rep = sfx.map { case (id, off, w) =>
      val m = sfx.collect {
        case (id2, off2, w2) if (id2, off2) != (id, off) => lcpRef(w, w2)
      }
      (id, if (m.isEmpty) 0L else m.max.toLong)
    }
    rep.groupBy(_._1).map { case (id, rs) =>
      id -> (rs.size.toLong, rs.map(_._2).max,
        rs.count(_._2 >= dupLen).toLong)
    }
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown cat naps under the lazy dog"),
    (3L, "entirely different words appear here only once"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "singleword"),
    (6L, "  doubled  spaces   here the quick brown fox ")
  )

  test("repeatProfile matches the exhaustive all-pairs reference") {
    val df = docs.toDF("doc_id", "text")
    val got = SuffixArray.repeatProfile(df, "doc_id", "text", maxLen, dupLen)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === profileRef(docs))
  }

  test("adjacent-in-SA max equals global max (the SA+LCP argument holds)") {
    // exact-dup docs 1 and 4: every suffix repeats fully (capped at window)
    val df = docs.toDF("doc_id", "text")
    val got = SuffixArray.repeatProfile(df, "doc_id", "text", maxLen, dupLen)
      .where(col("doc_id").isin(1L, 4L)).collect()
    // every suffix whose window is at least dupLen chars long repeats in
    // full; shorter tail suffixes ("dog", "lazy dog") cap below dupLen
    val nLongEnough = starts(docs.head._2)
      .count(off => docs.head._2.length - off + 1 >= dupLen).toLong
    got.foreach { r =>
      assert(r.getLong(2) === maxLen) // max_rep_len = full window
      assert(r.getLong(3) === nLongEnough)
    }
  }

  test("rowNumber: dense 1..n, deterministic under different partitioning") {
    val df = docs.toDF("doc_id", "text")
    val sa = SuffixArray.build(df, "doc_id", "text", maxLen)
    val ranks = sa.select("rank").as[Long].collect().sorted
    assert(ranks === (1L to ranks.length.toLong).toArray)
    val again = PrefixSum.rowNumber(
        SuffixArray.suffixes(df.repartition(7), "doc_id", "text", maxLen),
        Seq("w", "doc_id", "off"), "rank", partitions = 3)
      .select("doc_id", "off", "rank").collect().toSet
    assert(again === sa.select("doc_id", "off", "rank").collect().toSet)
  }
}
