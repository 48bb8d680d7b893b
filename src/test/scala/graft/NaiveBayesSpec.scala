package graft

import org.apache.spark.sql.functions._
import graft.ops.NaiveBayes

/** NB trainer/classifier vs hand-computed smoothed log-probabilities. */
class NaiveBayesSpec extends SparkSuite {
  import spark.implicits._

  private def lnMicros(num: Double, den: Double): Long =
    math.floor(math.log(num / den) * 1000000 + 0.5).toLong

  private val docs = Seq(
    (1L, "en", "the cat sat"),
    (2L, "en", "the dog sat"),
    (3L, "fr", "le chat assis"),
    (4L, "fr", "le chien le chat")
  ).toDF("doc_id", "lang", "text")

  private val toks = split(col("text"), " ")

  test("train: add-one smoothed likelihoods and class stats") {
    val (lik, stats) = NaiveBayes.train(docs, "doc_id", "lang", toks)
    // vocab = {the,cat,sat,dog,le,chat,assis,chien} = 8
    // en totals = 6 tokens, fr totals = 7 tokens
    val likMap = lik.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(likMap(("en", "the")) === ((2L, lnMicros(3, 14))))   // (2+1)/(6+8)
    assert(likMap(("en", "cat")) === ((1L, lnMicros(2, 14))))
    assert(likMap(("fr", "le")) === ((3L, lnMicros(4, 15))))    // (3+1)/(7+8)
    assert(!likMap.contains(("en", "le")))
    val st = stats.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(st("en") === ((2L, 6L, lnMicros(2, 4), lnMicros(1, 14))))
    assert(st("fr") === ((2L, 7L, lnMicros(2, 4), lnMicros(1, 15))))
  }

  test("classify: argmax with unseen backoff matches hand computation") {
    val (lik, stats) = NaiveBayes.train(docs, "doc_id", "lang", toks)
    val test = Seq((10L, "the cat purred"), (11L, "le chat")).toDF("doc_id", "text")
    val out = NaiveBayes.classify(test, "doc_id", split(col("text"), " "), lik, stats)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 10: en score = ln(1/2) + ln(3/14)+ln(2/14)+ln(1/14) (purred unseen)
    val en10 = lnMicros(1, 2) + lnMicros(3, 14) + lnMicros(2, 14) + lnMicros(1, 14)
    val fr10 = lnMicros(1, 2) + lnMicros(1, 15) + lnMicros(1, 15) + lnMicros(1, 15)
    assert(out(10L) === (("en", math.max(en10, fr10))))
    assert(en10 > fr10)
    val fr11 = lnMicros(1, 2) + lnMicros(4, 15) + lnMicros(3, 15)
    assert(out(11L) === (("fr", fr11)))
  }

  test("classify: tie breaks on ascending label") {
    // symmetric corpus: "x" appears once in each class with equal totals,
    // so scores tie exactly and the argmax must pick the smaller label
    val sym = Seq((1L, "a", "x y"), (2L, "b", "x z")).toDF("doc_id", "lang", "text")
    val (lik, stats) = NaiveBayes.train(sym, "doc_id", "lang", split(col("text"), " "))
    val out = NaiveBayes.classify(Seq((9L, "x")).toDF("doc_id", "text"),
        "doc_id", split(col("text"), " "), lik, stats)
      .collect()
    assert(out.head.getString(1) === "a")
  }

  test("classify: shuffle-join path (broadcastModel=false) identical") {
    val (lik, stats) = NaiveBayes.train(docs, "doc_id", "lang", toks)
    val test = Seq((10L, "the cat purred"), (11L, "le chat")).toDF("doc_id", "text")
    val a = NaiveBayes.classify(test, "doc_id", split(col("text"), " "),
      lik, stats, broadcastModel = true).collect().toSet
    val b = NaiveBayes.classify(test, "doc_id", split(col("text"), " "),
      lik, stats, broadcastModel = false).collect().toSet
    assert(a === b)
  }
}
