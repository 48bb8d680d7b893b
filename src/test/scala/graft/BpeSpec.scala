package graft

import org.apache.spark.sql.functions._
import graft.ops.BpeTrain

/** BPE trainer vs a sequential reference, plus encode round-trip. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  /** Sequential BPE with the identical contract: weighted pair counts,
    * (count desc, left, right) argmax, greedy left-to-right merge.
    */
  private def reference(wf: Map[String, Long], n: Int)
      : Seq[(Int, String, String, Long)] = {
    var vocab: Map[String, Vector[String]] =
      wf.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 0
    var done = false
    while (step < n && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- vocab; i <- 0 until syms.size - 1)
        pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + wf(w)
      if (pc.isEmpty) done = true
      else {
        val ((l, r), c) = pc.minBy { case ((a, b), cnt) => (-cnt, a, b) }
        out += ((step, l, r, c))
        vocab = vocab.map { case (w, syms) =>
          val folded = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc.init :+ (l + r)
            else acc :+ x
          }
          w -> folded
        }
        step += 1
      }
    }
    out.toSeq
  }

  private lazy val corpus = Seq(
    "the theme of the thesis is the theory",
    "low lower lowest newer newest wider widest",
    "aaaa aaa aa a banana bandana",
    "The THE the tHe") // case folding collapses these
    .toDF("text")

  test("learnMerges matches the sequential reference") {
    val wf = BpeTrain.wordFreq(corpus, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = reference(wf, 8)
    val got = BpeTrain.learnMerges(corpus, "text", 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
    assert(got.size === 8)
    // a later merge must build on an earlier merged symbol at least once
    val merged = got.map(m => m._2 + m._3).toSet
    assert(got.exists(m => merged.contains(m._2) || merged.contains(m._3)),
      s"no second-order merge in $got — corpus too flat to exercise the fold")
  }

  test("greedy fold handles runs: aaaa -> [aa,aa], aaa -> [aa,a]") {
    val df = Seq("aaaa aaa").toDF("text")
    val (merges, vocab) = BpeTrain.train(BpeTrain.wordFreq(df, "text"), 1)
    assert(merges.head.left === "a" && merges.head.right === "a")
    val syms = vocab.collect().map(r =>
      r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(syms("aaaa") === List("aa", "aa"))
    assert(syms("aaa") === List("aa", "a"))
    vocab.unpersist()
  }

  test("encode applies learned merges in order, map-only") {
    val (merges, vocab) = BpeTrain.train(BpeTrain.wordFreq(corpus, "text"), 8)
    vocab.unpersist()
    val enc = BpeTrain.encode(Seq("the lowest theme").toDF("text"), "text", merges)
    val toks = enc.select("bpe_tokens").head().getSeq[String](0).toList
    // reference encode: same fold per word
    def fold1(syms: Vector[String], l: String, r: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
        else acc :+ x
      }
    val expected = "the lowest theme".split(' ').toList.flatMap { w =>
      merges.foldLeft(w.map(_.toString).toVector) { (s, m) =>
        fold1(s, m.left, m.right)
      }
    }
    assert(toks === expected)
    // no shuffle: encode's plan must contain no Exchange
    val exchanges = enc.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty)
  }

  test("merge count capped by vocabulary exhaustion") {
    val df = Seq("ab ab ab").toDF("text")
    val (merges, vocab) = BpeTrain.train(BpeTrain.wordFreq(df, "text"), 10)
    vocab.unpersist()
    // "ab" merges once to a single symbol; then no pairs remain
    assert(merges.size === 1)
    assert(merges.head.left === "a" && merges.head.right === "b")
  }
}
