package graft

import org.apache.spark.sql.functions._

import graft.ops.FeatureSelect

/** χ² top-k term selection vs a sequential reference with the same pinned
  * IEEE sequence.
  */
class FeatureSelectSpec extends SparkSuite {
  import spark.implicits._

  private def refChi2(docs: Seq[(Long, String, String)], k: Int)
      : Set[(String, Long, String, Long, Long, Long, Long, Long)] = {
    val n = docs.size.toLong
    val classN = docs.groupBy(_._2).map { case (l, d) => l -> d.size.toLong }
    val presence = docs.flatMap { case (id, l, text) =>
      text.split("\\s+").filter(_.nonEmpty).distinct.map(t => (t, l)) }
    val termTotals = presence.groupBy(_._1).map { case (t, p) => t -> p.size.toLong }
    val scored = presence.groupBy(identity).toSeq
      .map { case ((t, l), p) => (t, l, p.size.toLong) }
      .filter { case (t, _, _) => termTotals(t) < n }
      .map { case (t, l, a) =>
        val b = termTotals(t) - a
        val c = classN(l) - a
        val d = n - classN(l) - b
        val diff = a * d - b * c
        val chi2 = ((n.toDouble * diff.toDouble) * diff.toDouble) /
          ((((a + b).toDouble * (c + d).toDouble) * (a + c).toDouble) * (b + d).toDouble)
        (l, t, a, b, c, d, math.floor(chi2 * 1000000 + 0.5).toLong)
      }
    scored.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy { case (_, t, _, _, _, _, s) => (-s, t) }
        .take(k).zipWithIndex
        .map { case ((l, t, a, b, c, d, s), i) =>
          (l, (i + 1).toLong, t, a, b, c, d, s) }
    }.toSet
  }

  test("hand corpus: counts, χ² micros, ranks, universal-term exclusion") {
    val docs = Seq[(Long, String, String)](
      (1L, "en", "the cat sat"), (2L, "en", "the cat ran"),
      (3L, "en", "the dog sat"),
      (4L, "es", "el gato the"), (5L, "es", "el perro the"))
    // "the" appears in every doc → excluded (c+d would be 0)
    val got = FeatureSelect.chiSquaredTopK(docs.toDF("doc_id", "lang", "text"),
        "doc_id", "lang", split(col("text"), "\\s+"), k = 3)
      .as[(String, Long, String, Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(!got.exists(_._3 == "the"))
    assert(got === refChi2(docs, 3))
    // spot-check one contingency by hand: "cat" in en → a=2,b=0,c=1,d=2
    val cat = got.find(r => r._1 == "en" && r._3 == "cat").get
    assert((cat._4, cat._5, cat._6, cat._7) === ((2L, 0L, 1L, 2L)))
    // χ² = 5·(2·2−0·1)² / (2·3·3·2) = 80/36
    assert(cat._8 === math.floor(80.0 / 36.0 * 1000000 + 0.5).toLong)
  }

  test("seeded random corpus matches the sequential reference") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (0 until 120).map { i =>
      val lang = Seq("x", "y", "z")(rnd.nextInt(3))
      val words = (0 until 6 + rnd.nextInt(6)).map(_ => vocab(rnd.nextInt(vocab.size)))
      (i.toLong, lang, words.mkString(" "))
    }
    val got = FeatureSelect.chiSquaredTopK(docs.toDF("doc_id", "lang", "text"),
        "doc_id", "lang", split(col("text"), "\\s+"), k = 5)
      .as[(String, Long, String, Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(got === refChi2(docs, 5))
  }

  test("single-class corpus yields the empty top-k, never DIVIDE_BY_ZERO") {
    // round-15 hot-key sweep find: with every doc carrying ONE label the
    // "not in class" column is all-zero (b+d = 0) and χ²'s denominator
    // hit an engine DIVIDE_BY_ZERO. No term can discriminate the only
    // class, so the contract is the empty result — the symmetric twin of
    // the corpus-universal-term exclusion.
    val docs = (0 until 20).map(i => (i.toLong, "only", s"w$i common"))
    val got = FeatureSelect.chiSquaredTopK(docs.toDF("doc_id", "lang", "text"),
      "doc_id", "lang", split(col("text"), "\\s+"), k = 5)
    assert(got.count() === 0L)
  }
}
