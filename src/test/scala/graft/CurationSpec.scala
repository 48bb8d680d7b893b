package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.ops.{Curation, Scoring}

/** Curation + scoring ops on corpora small enough to compute by hand. */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  private val toks = TextAnalysis.tokens(col("text"))

  test("decontaminate flags docs sharing an n-gram with the benchmark") {
    val docs = Seq(
      (1L, "the quick brown fox", true),   // benchmark
      (2L, "a quick brown fox runs", false), // shares "quick brown fox"? n=3
      (3L, "totally different words here", false),
      (4L, "the quick brown dog", false))  // shares "the quick brown"
      .toDF("doc_id", "text", "bench")
    val out = Curation.decontaminate(docs, "doc_id",
        graft.functions.WordShinglesExpr(col("text"), 3), col("bench"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc 2 shares {quick brown fox}; doc 4 shares {the quick brown};
    // doc 3 shares nothing and must be absent
    assert(out.toSeq == Seq((2L, 1L), (4L, 1L)))
  }

  test("decontaminate bloom path equals the broadcast path") {
    val docs = Seq(
      (1L, "the quick brown fox", true),
      (2L, "a quick brown fox runs", false),
      (3L, "totally different words here", false),
      (4L, "the quick brown dog", false))
      .toDF("doc_id", "text", "bench")
    val sh = graft.functions.WordShinglesExpr(col("text"), 3)
    val bcast = Curation.decontaminate(docs, "doc_id", sh, col("bench"))
      .orderBy("doc_id").collect().toSeq
    val bloom = Curation.decontaminate(docs, "doc_id", sh, col("bench"),
        benchBroadcastable = false)
      .orderBy("doc_id").collect().toSeq
    assert(bloom == bcast && bcast.nonEmpty)
  }

  test("blocklistFilter counts lexicon hits and flags, empty lexicon rejected") {
    val docs = Seq(
      (1L, "clean text here"),
      (2L, "spam spam and more spam"),
      (3L, "one bad word")).toDF("doc_id", "text")
    val toks = graft.functions.TextAnalysis.tokens(col("text"))
    val out = Curation.blocklistFilter(docs, "doc_id", toks, Seq("spam", "bad"))
      .select("doc_id", "n_hits", "flagged").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((1L, 0L, false), (2L, 3L, true), (3L, 1L, true)))
    intercept[IllegalArgumentException] {
      Curation.blocklistFilter(docs, "doc_id", toks, Seq.empty)
    }
  }

  test("duplicateSpans counts spans occurring in >1 doc") {
    val docs = Seq(
      (1L, "a b c d"),   // spans(2): {a b, b c, c d}
      (2L, "b c d e"),   // spans(2): {b c, c d, d e}
      (3L, "x y z w"))   // disjoint
      .toDF("doc_id", "text")
    val out = Curation.duplicateSpans(docs, "doc_id",
        graft.functions.WordShinglesExpr(col("text"), 2))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 2L, 0.666667), // b c, c d duplicated
      (2L, 3L, 2L, 0.666667),
      (3L, 3L, 0L, 0.0)))
  }

  test("tokenBudgetSelect takes best-score docs until the budget") {
    val docs = Seq(
      (1L, 0.9, 40L), (2L, 0.8, 40L), (3L, 0.7, 40L), (4L, 0.6, 40L))
      .toDF("doc_id", "score", "tokens")
    val out = Curation.tokenBudgetSelect(docs, "doc_id", col("score"),
        col("tokens"), 100L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    // cum_before: doc1=0, doc2=40, doc3=80, doc4=120 → first three selected
    assert(out.toSeq == Seq((1L, 0L, true), (2L, 40L, true),
      (3L, 80L, true), (4L, 120L, false)))
  }

  test("tokenBudgetSelect breaks score ties by id (total order)") {
    val docs = Seq((5L, 0.5, 10L), (2L, 0.5, 10L), (9L, 0.5, 10L))
      .toDF("doc_id", "score", "tokens")
    val out = Curation.tokenBudgetSelect(docs, "doc_id", col("score"),
        col("tokens"), 15L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq((2L, 0L, true), (5L, 10L, true), (9L, 20L, false)))
  }

  test("domainMixture: sqrt-temperature weights sum to ~1 and favor small domains") {
    val docs = Seq(("a", 90L), ("b", 10L)).toDF("source", "toks_in")
    val out = Curation.domainMixture(docs, "source", col("toks_in"))
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // share: 0.9/0.1 → sqrt: 0.948683/0.316228 → micros 948683/316228
    // weights: 948683/1264911 = 0.75 (rounded 0.750000), 316228/1264911
    assert(out.map(_._3).toSeq == Seq(0.9, 0.1))
    assert(math.abs(out.map(_._4).sum - 1.0) < 0.000002)
    assert(out(1)._4 > 0.1 && out(0)._4 < 0.9) // temperature flattens
  }

  test("qualityBands: percent_rank and decile bands per group") {
    val docs = Seq(
      (1L, "g", 0.1), (2L, "g", 0.2), (3L, "g", 0.3), (4L, "g", 0.4),
      (5L, "g", 0.5), (6L, "h", 0.9))
      .toDF("doc_id", "grp", "q")
    val out = Curation.qualityBands(docs, "doc_id", "grp", col("q"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getLong(4)))
    // group g: pr = k/4 → 0, .25, .5, .75, 1; bands 0,2,5,7,9
    assert(out.toSeq == Seq((1L, 0.0, 0L), (2L, 0.25, 2L), (3L, 0.5, 5L),
      (4L, 0.75, 7L), (5L, 1.0, 9L), (6L, 0.0, 0L)))
  }

  test("slidingChunks windows with overlap and clamps the tail") {
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6"), (2L, "a b")).toDF("doc_id", "text")
    val out = Curation.slidingChunks(docs, "doc_id", toks, 4, 3)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc1 len 7: nc = floor((7-4+2)/3)+1 = floor(5/3)+1 = 2 →
    //   [t0..t3] and [t3..t6]; doc2 len 2 → one short chunk
    assert(out.toSeq == Seq((1L, 0L, 4L), (1L, 1L, 4L), (2L, 0L, 2L)))
  }

  test("slidingChunks chunk fingerprint covers the right tokens") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val out = Curation.slidingChunks(docs, "doc_id", toks, 3, 2)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getString(3)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    // windows: [a b c], [c d e], [e]  (nc = floor((5-3+1)/2)+1 = 2 → wait:
    // (5-3+2-1)=3, floor(3/2)=1, +1 = 2 chunks: [a b c], [c d e]
    assert(out.toSeq == Seq((0L, md5hex("a b c")), (1L, md5hex("c d e"))))
  }

  test("crossMinhashLshPairs finds near-dups BETWEEN corpora only") {
    import graft.ops.Dedup
    val mk = (id: Long, t: String) => (id, t)
    val existing = Seq(
      mk(1L, "alpha beta gamma delta epsilon zeta"),
      mk(2L, "one two three four five six"))
      .toDF("doc_id", "text")
      .withColumn("_sh", graft.functions.WordShinglesExpr(col("text"), 2))
    val fresh = Seq(
      mk(10L, "alpha beta gamma delta epsilon eta"), // near-dup of 1
      mk(11L, "totally unrelated content right here"),
      mk(12L, "one two three four five six"))        // exact dup of 2
      .toDF("doc_id", "text")
      .withColumn("_sh", graft.functions.WordShinglesExpr(col("text"), 2))
    val out = Dedup.crossMinhashLshPairs(existing, fresh, "doc_id", "_sh",
        4, 2, "t", 0.5)
      .orderBy("id_left", "id_right")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // 2↔12 identical (jac 1.0) must appear; 1↔10 shares 4 of 6 bigrams
    // (jac 4/7 ≈ 0.57 ≥ 0.5) appears if any band collides; 11 never pairs
    assert(out.contains((2L, 12L)))
    assert(!out.exists(p => p._1 == 11L || p._2 == 11L))
    assert(out.forall(p => p._1 < 10L && p._2 >= 10L)) // left×right only
  }

  test("mixtureSample keeps everything in the top domain, is deterministic") {
    val docs = (0L until 100L).map(i =>
      (i, if (i < 90) "big" else "small", 10L)).toDF("doc_id", "src", "tk")
    val out = Curation.mixtureSample(docs, "doc_id", "src", col("tk"), "s1")
    val out2 = Curation.mixtureSample(docs, "doc_id", "src", col("tk"), "s1")
    assert(out.collect().map(_.toSeq).toSet == out2.collect().map(_.toSeq).toSet)
    // big: share 0.9 → wm 948683; small: 0.1 → wm 316228; rate(big)=1.0
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("big") == 90L) // rate 1.0 keeps all
    assert(bySrc.getOrElse("small", 0L) <= 10L)
  }

  test("iqrOutliers: Tukey fences per group flag the extreme row") {
    // group g: values 1..9 plus an outlier 100
    val docs = ((1 to 9).map(i => (i.toLong, "g", i.toLong)) :+ (10L, "g", 100L))
      .toDF("doc_id", "grp", "v_in")
    val out = Curation.iqrOutliers(docs, "doc_id", "grp", col("v_in"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(5)))
    // n=10: p25 = 3.25, p75 = 7.75, iqr = 4.5 → fences [-3.5, 14.5]
    assert(out.count(_._2) == 1 && out.last == ((10L, true)))
  }

  test("normalizeText lowers, strips, collapses and trims") {
    val out = Seq(Tuple1("  Hello,   WORLD!!  #x  ")).toDF("text")
      .select(TextAnalysis.normalizeText(col("text"))).head().getString(0)
    assert(out == "hello, world!! x")
  }

  test("sourceProfile aggregates counts, modal lang and mean quality") {
    val docs = Seq(
      (1L, "s1", "en", 10L, 0.5), (2L, "s1", "en", 20L, 0.7),
      (3L, "s1", "de", 30L, 0.9), (4L, "s2", "fr", 40L, 0.25))
      .toDF("doc_id", "src", "lang", "tk", "q")
    val out = Curation.sourceProfile(docs, "src", "lang", col("tk"), col("q"))
      .orderBy("src")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getString(5), r.getDouble(6)))
    assert(out.toSeq == Seq(
      ("s1", 3L, 60L, 20.0, 2L, "en", 0.7),
      ("s2", 1L, 40L, 40.0, 1L, "fr", 0.25)))
  }

  test("sourceProfile modal-lang tie breaks to the smaller lang") {
    val docs = Seq(
      (1L, "s", "en", 1L, 0.5), (2L, "s", "de", 1L, 0.5))
      .toDF("doc_id", "src", "lang", "tk", "q")
    val top = Curation.sourceProfile(docs, "src", "lang", col("tk"), col("q"))
      .head().getString(5)
    assert(top == "de")
  }

  test("redact masks emails and digit runs; count matches") {
    val df = Seq(Tuple1("mail me at a.b+c@ex-ample.org ref 123456 ok 123"))
      .toDF("t")
    val red = df.select(TextAnalysis.redact(col("t"))).head().getString(0)
    assert(red == "mail me at <email> ref <num> ok 123")
    val n = df.select(TextAnalysis.redactionCount(col("t"))).head().getInt(0)
    assert(n == 2)
  }

  test("curate: dedup keeps first, quality floor applies, budget selects") {
    val docs = Seq(
      (1L, "Good Doc here", 0.9, 10L),
      (2L, "good   doc HERE", 0.9, 10L),  // normalizes to doc 1 → dropped
      (3L, "junk", 0.2, 10L),             // below quality floor
      (4L, "other text", 0.8, 10L),
      (5L, "more text", 0.7, 10L))
      .toDF("doc_id", "text", "q", "tk")
    val out = Curation.curate(docs, "doc_id", "text", col("q"), col("tk"),
        0.5, 15L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    // survivors 1, 4, 5 in score order (0.9, 0.8, 0.7): cum 0, 10, 20
    assert(out.toSeq == Seq((1L, 0L, true), (4L, 10L, true), (5L, 20L, false)))
  }

  test("Quantiles.perGroup interpolates type-7 order statistics per group") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0), ("h", 10.0))
      .toDF("grp", "v")
    val out = graft.ops.Quantiles.perGroup(df, "grp", "v",
        Seq("p50" -> 0.5, "p75" -> 0.75))
      .orderBy("grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // g: p50 pos 1.5 → 2.5; p75 pos 2.25 → 3.25. h: single value.
    assert(out.toSeq == Seq(("g", 4L, 2.5, 3.25), ("h", 1L, 10.0, 10.0)))
  }

  test("keepBestPerCluster keeps the highest-score member, id tiebreak") {
    val labeled = Seq(
      (1L, 100L, 0.5), (2L, 100L, 0.9), (3L, 100L, 0.9), // best: 2 (tie → min id)
      (4L, 200L, 0.1))
      .toDF("doc_id", "cluster_id", "score")
    val out = Curation.keepBestPerCluster(labeled, "cluster_id", "doc_id",
        col("score"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(3)))
    assert(out.toSeq == Seq((1L, false), (2L, true), (3L, false), (4L, true)))
  }

  test("hardNegatives excludes same-label vectors and ranks by cosine") {
    val vecs = Seq(
      (0L, 0L, Seq(1.0f, 0.0f)),   // query, label 0
      (1L, 0L, Seq(1.0f, 0.01f)),  // same label → excluded despite sim≈1
      (2L, 1L, Seq(1.0f, 0.2f)),   // diff label, high sim
      (3L, 1L, Seq(0.0f, 1.0f)),   // diff label, orthogonal
      (4L, 2L, Seq(1.0f, 0.1f)))   // diff label, highest sim
      .toDF("vec_id", "label", "embedding")
    val out = graft.ops.Similarity.hardNegatives(vecs, "vec_id", "embedding",
        "label", col("vec_id") === 0, 2)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq((4L, 1), (2L, 2)))
  }

  test("randomProjection matches the driver-side plane dot exactly") {
    val v = Seq(0.5f, -1.0f, 2.0f)
    val df = Seq((7L, v)).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.randomProjection(df, "embedding", 2, "rpT")
      .select("p0", "p1").head()
    (0 until 2).foreach { p =>
      val plane = graft.ops.Similarity.planeVector(p, 64, "rpT")
      val expect = v.map(_.toDouble).zip(plane).map { case (a, b) => a * b }
        .foldLeft(0.0)(_ + _)
      val rounded = math.floor(expect * 1e6 + 0.5) / 1e6
      assert(out.getDouble(p) == rounded, s"plane $p")
    }
  }

  test("winsorize clamps to the group's type-7 quantile fences") {
    // group g: values 0..10 → p25 = 2.5, p75 = 7.5 (numpy linear)
    val df = (0 to 10).map(i => (i.toLong, "g", i.toDouble)).toDF("id", "grp", "x")
    val out = Curation.winsorize(df, "id", "grp", col("x"), 0.25, 0.75)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.forall { case (_, lo, hi, _) => lo == 2.5 && hi == 7.5 })
    assert(out.map(_._4).toSeq ==
      Seq(2.5, 2.5, 2.5, 3.0, 4.0, 5.0, 6.0, 7.0, 7.5, 7.5, 7.5))
  }

  test("winsorize rejects inverted or out-of-range percentiles") {
    val df = Seq((1L, "g", 1.0)).toDF("id", "grp", "x")
    intercept[IllegalArgumentException] {
      Curation.winsorize(df, "id", "grp", col("x"), 0.95, 0.05)
    }
    intercept[IllegalArgumentException] {
      Curation.winsorize(df, "id", "grp", col("x"), 0.05, 1.5)
    }
  }

  test("randomProjection covers vectors wider than the default plane length") {
    // 80 > default dims=64: before the width probe the plane literal was
    // too short, the zip_with dot hit a length mismatch and every pN was
    // silently NULL. The probe must size the literal to the corpus max.
    val wide = (0 until 80).map(i => (i % 5 - 2).toFloat)
    val df = Seq((1L, wide)).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.randomProjection(df, "embedding", 2, "rpW")
      .select("p0", "p1").head()
    (0 until 2).foreach { p =>
      assert(!out.isNullAt(p), s"plane $p projected to NULL")
      val plane = graft.ops.Similarity.planeVector(p, 80, "rpW")
      val expect = wide.map(_.toDouble).zip(plane).map { case (a, b) => a * b }
        .foldLeft(0.0)(_ + _)
      val rounded = math.floor(expect * 1e6 + 0.5) / 1e6
      assert(out.getDouble(p) == rounded, s"plane $p")
    }
  }

  test("bm25 ranks the doc saturated in a rare term first") {
    val docs = Seq(
      (1L, "x x x y"),
      (2L, "x y z z"),
      (3L, "p q r s"))
      .toDF("doc_id", "text")
    val out = Scoring.bm25(docs, "doc_id", toks, Seq("x", "z"), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // z is rarer (df=1) than x (df=2); doc2 has both terms → top score;
    // doc3 matches nothing and is absent
    assert(out.map(_._1).toSeq == Seq(2L, 1L))
    assert(out.forall(_._2 > 0.0))
  }

  test("unigramLogProb: common-token docs score higher than rare-token docs") {
    val docs = Seq(
      (1L, "a a a a"), // all common
      (2L, "a a q r")) // two hapaxes
      .toDF("doc_id", "text")
    val out = Scoring.unigramLogProb(docs, "doc_id", toks)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // p(a) = 6/8, p(q) = p(r) = 1/8
    val lpA = math.floor(math.log(6.0 / 8.0) * 1e6 + 0.5) / 1e6
    val lpQ = math.floor(math.log(1.0 / 8.0) * 1e6 + 0.5) / 1e6
    assert(out(0)._2 == 4L && out(1)._2 == 4L)
    assert(out(0)._3 > out(1)._3)
    val exp1 = math.floor((4 * lpA * 1e6) / 1e6 / 4.0 * 1e6 + 0.5) / 1e6
    assert(math.abs(out(0)._3 - exp1) < 1e-9)
    val exp2 = math.floor(((2 * lpA + 2 * lpQ) * 1e6) / 1e6 / 4.0 * 1e6 + 0.5) / 1e6
    assert(math.abs(out(1)._3 - exp2) < 1e-9)
  }

  test("compaction plan matches the sequential walk and is repartition-stable") {
    import graft.ops.Compaction
    val sizes = (1L to 200L).map(i => (i, 50L + (i % 37) * 10))
    val files = sizes.toDF("fid", "bytes")
    def run(df: org.apache.spark.sql.DataFrame) =
      Compaction.plan(df, "fid", "bytes", 1000L)
        .select("fid", "cum_before", "bin")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val out = run(files)
    var cum = 0L
    val expected = sizes.map { case (i, b) =>
      val row = (i, cum, cum / 1000L); cum += b; row
    }
    assert(out == expected)
    assert(run(files.repartition(7)) == out)
    // multi-bin, and bins are contiguous in file order
    assert(out.map(_._3).distinct.size > 10)
    assert(out.map(_._3).toSeq == out.map(_._3).sorted)
  }

  test("mooreLewis: likelihood-ratio scores match the sequential reference, smoothing covers unseen terms") {
    val docs = Seq(
      (1L, "in", "alpha alpha beta"),
      (2L, "in", "alpha beta beta"),
      (3L, "out", "alpha alpha alpha"),
      (4L, "out", "gamma gamma gamma") // gamma never appears in-domain
    ).toDF("doc_id", "dom", "text")
    val out = Scoring.mooreLewis(docs, "doc_id",
        TextAnalysis.tokens(col("text")), col("dom") === "in")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    // gen: alpha=6 beta=3 gamma=3 tot=12 V=3; in (docs 1,2): alpha=3 beta=3 tot_in=6
    def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val dAlpha = micro(math.log(4.0 / 9)) - micro(math.log(6.0 / 12))
    val dBeta = micro(math.log(4.0 / 9)) - micro(math.log(3.0 / 12))
    val dGamma = micro(math.log(1.0 / 9)) - micro(math.log(3.0 / 12))
    def score(ds: Long, n: Int) =
      math.floor(ds.toDouble / 1e6 / n * 1e6 + 0.5) / 1e6
    assert(out(0) === ((1L, 3L, score(2 * dAlpha + dBeta, 3), score(2 * dAlpha + dBeta, 3) > 0)))
    assert(out(1) === ((2L, 3L, score(dAlpha + 2 * dBeta, 3), true)))
    assert(out(3) === ((4L, 3L, score(3 * dGamma, 3), false))) // unseen → negative
    assert(out(1)._3 > out(0)._3) // more betas (in-domain-distinctive) → higher
  }

  test("htmlToText: script/style dropped, tags stripped, entities decoded, breaks kept as spaces") {
    val rows = Seq(
      (1L, "<html><head><style>p{x}</style><script src=\"a.js\">var y;</script></head>" +
        "<body><h1>Title</h1><p>one&nbsp;two</p><p>3 &lt; 4 &amp;&amp; 5 &gt; 2</p>" +
        "<div>a<br/>b</div></body></html>"),
      (2L, "plain text, no markup"),
      (3L, "<SCRIPT>\nmulti\nline\n</SCRIPT>keep <b>bold</b> &quot;q&quot; &#39;s&#39;"),
      (4L, "a<p>unclosed tag content")
    ).toDF("id", "html")
    val out = rows.select(col("id"), TextAnalysis.htmlToText(col("html")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "Title one two 3 < 4 && 5 > 2 a b")
    assert(out(2L) === "plain text, no markup")
    assert(out(3L) === "keep bold \"q\" 's'")
    assert(out(4L) === "a unclosed tag content")
  }

  test("HLL sketch merge: union of per-group sketches tracks the global sketch and exact count") {
    // register max is associative, but DataSketches keeps small sketches
    // in sparse coupon mode (near-exact) and a union promotes to dense
    // HLL — so the merged estimate can differ slightly from the
    // single-pass sketch. The contract the gate relies on is the ERROR
    // ENVELOPE: both estimates within 5% of exact (lgK=12 → ~1.6% rse).
    val df = (1L to 20000L).map(i => (i % 10, i % 3000)).toDF("g", "u")
    val unioned = df.groupBy("g").agg(hll_sketch_agg(col("u"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .head().getLong(0)
    val single = df.agg(hll_sketch_estimate(hll_sketch_agg(col("u"), lit(12))).as("e"))
      .head().getLong(0)
    assert(math.abs(unioned - 3000L) <= 150L)
    assert(math.abs(single - 3000L) <= 150L)
    // the estimate itself is NOT partitioning-independent (sparse→dense
    // promotion depends on the merge layout: 3007 vs 3011 observed for
    // the same data under different partitionings) — which is exactly why
    // only the ENVELOPE, never the estimate, crosses a gate boundary
    val again = df.repartition(13).groupBy("g")
      .agg(hll_sketch_agg(col("u"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .head().getLong(0)
    assert(math.abs(again - 3000L) <= 150L)
  }

  test("ccnetBuckets: per-language LM conditioning and tercile labels") {
    // en: docs 1-3 — doc 1 all-common tokens, doc 3 has the rare one;
    // de: docs 4-6 — "x" is common in de but absent in en, so conditioning
    // on language matters: scores must come from the own-language LM only
    val docs = Seq(
      (1L, "en", "a a a a"), (2L, "en", "a a b"), (3L, "en", "a b r"),
      (4L, "de", "x x x"), (5L, "de", "x x y"), (6L, "de", "y z x")
    ).toDF("doc_id", "lang", "text")
    val out = Scoring.ccnetBuckets(docs, "doc_id", "lang",
        TextAnalysis.tokens(col("text")))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getString(5)))
    def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    def mean(ss: Seq[Long]) =
      math.floor(ss.sum.toDouble / 1e6 / ss.size * 1e6 + 0.5) / 1e6
    // en LM: a=7 b=2 r=1 of 10
    val (lpA, lpB, lpR) =
      (micro(math.log(0.7)), micro(math.log(0.2)), micro(math.log(0.1)))
    assert(out(0) === ((1L, "en", 4L, mean(Seq(lpA, lpA, lpA, lpA)), 1L, "head")))
    assert(out(1) === ((2L, "en", 3L, mean(Seq(lpA, lpA, lpB)), 2L, "middle")))
    assert(out(2) === ((3L, "en", 3L, mean(Seq(lpA, lpB, lpR)), 3L, "tail")))
    // de LM: x=6 y=2 z=1 of 9 — doc 4 head, 6 tail; en tokens don't leak in
    assert(out(3)._6 === "head" && out(5)._6 === "tail")
    val (lpX, lpY, lpZ) = (micro(math.log(6.0 / 9)), micro(math.log(2.0 / 9)),
      micro(math.log(1.0 / 9)))
    assert(out(5)._4 === mean(Seq(lpY, lpZ, lpX)))
    // every language has exactly one of each tercile here
    assert(out.filter(_._2 == "en").map(_._6).sorted.toSeq ===
      Seq("head", "middle", "tail"))
  }

  test("dsirSelect: hashed-bucket importance weights and Gumbel-top-k match the sequential reference") {
    val docs = Seq(
      (1L, true, "a b c"),
      (2L, true, "a b a"),
      (3L, false, "a b z"),
      (4L, false, "c a"),
      (5L, false, "q")   // 1 token: no bigrams, excluded
    ).toDF("doc_id", "t", "text")
    val B = 64
    val out = Scoring.dsirSelect(docs, "doc_id",
        TextAnalysis.tokens(col("text")), col("t"), buckets = B, k = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    // sequential reference on the same hash
    def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val perDoc = Map(
      1L -> Seq("a b", "b c"), 2L -> Seq("a b", "b a"),
      3L -> Seq("a b", "b z"), 4L -> Seq("c a"))
    val tgtIds = Set(1L, 2L)
    def bucket(big: String) =
      java.lang.Math.floorMod(graft.functions.Hashing.hash60Jvm(big, "dsir"), B.toLong)
    val allOcc = perDoc.toSeq.flatMap { case (id, bs) => bs.map(id -> bucket(_)) }
    val cr = allOcc.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ct = allOcc.filter(o => tgtIds(o._1)).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val (nr, nt) = (allOcc.size.toLong, allOcc.count(o => tgtIds(o._1)).toLong)
    def lr(b: Long) = micro(math.log((ct.getOrElse(b, 0L) + 1).toDouble / (nt + B))) -
      micro(math.log((cr(b) + 1).toDouble / (nr + B)))
    def gumbel(id: Long) = micro(-math.log(-math.log(
      (graft.functions.Hashing.hash60Jvm(id.toString, "dsir_g").toDouble + 0.5)
        / 1152921504606846976.0)))
    val ref = perDoc.map { case (id, bs) =>
      val w = bs.map(b => lr(bucket(b))).sum
      (id, bs.size.toLong, w, w + gumbel(id))
    }.toSeq
    val topK = ref.sortBy(r => (-r._4, r._1)).take(2).map(_._1).toSet
    val expected = ref.map(r => (r._1, r._2, r._3, r._4, topK(r._1))).sortBy(_._1)
    assert(out.toSeq === expected)
    assert(!out.map(_._1).contains(5L))
    // docs 2 and 3 share "a b" plus one exclusive bigram each: the
    // target-exclusive one ("b a", ct=1) must outweigh the raw-only one
    // ("b z", ct=0)
    assert(out(1)._3 > out(2)._3)
  }

  test("rrfFuse: integer contributions, list-overlap boost, deterministic tiebreak") {
    val ra = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val rb = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val out = Scoring.rrfFuse(Seq(ra, rb), "doc_id", 60, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def c(rank: Int) = 1000000L / (60 + rank)
    val expected = Map(
      10L -> (c(1), 1L), 20L -> (c(2) + c(1), 2L),
      30L -> (c(3), 1L), 40L -> (c(2), 1L))
    assert(out.map(t => t._1 -> ((t._2, t._3))).toMap === expected)
    // doc 20 (in both lists) outranks every single-list doc
    assert(out.head._1 === 20L)
    // output is ordered (rrf desc, id): 20, then 10 (16393), 40 (16129), 30 (15873)
    assert(out.map(_._1).toSeq === Seq(20L, 10L, 40L, 30L))
  }

  test("capSourceShare keeps each source's best-first prefix under the global cap") {
    // total = 100; cap 30% = 30 per source
    val docs = Seq(
      (1L, "a", 20L), (2L, "a", 15L), (3L, "a", 10L), // a: cum 20,35,45
      (4L, "b", 25L), (5L, "b", 5L),                  // b: cum 25,30
      (6L, "c", 25L)                                  // c: cum 25
    ).toDF("doc_id", "source", "w")
    val out = Curation.capSourceShare(docs, "doc_id", "source", col("w"), 300)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) === ((20L, true)))
    assert(out(2L) === ((35L, false))) // 35 > 30: over the cap
    assert(out(3L) === ((45L, false)))
    assert(out(4L) === ((25L, true)))
    assert(out(5L) === ((30L, true))) // exactly at the cap: kept
    assert(out(6L) === ((25L, true)))
  }

  test("capSourceShare orders best-first within a source (weight desc, id tiebreak)") {
    // same source, cap = 50% of 40 = 20: the HEAVIER doc survives even
    // though it has the larger id
    val docs = Seq((1L, "s", 15L), (2L, "s", 20L), (3L, "s", 5L))
      .toDF("doc_id", "source", "w")
    val out = Curation.capSourceShare(docs, "doc_id", "source", col("w"), 500)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("lengthBuckets: padding accounts exactly, zero-token docs land in bucket 0") {
    val docs = Seq((1L, 0L), (2L, 1L), (3L, 128L), (4L, 129L), (5L, 100L))
      .toDF("doc_id", "n")
    val out = Curation.lengthBuckets(docs, col("n"), 128)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // bucket 0: the zero-token doc; bucket 128: docs 2,3,5; bucket 256: doc 4
    assert(out(0L) === ((1L, 0L, 0L)))
    assert(out(128L) === ((3L, 229L, 3L * 128L - 229L)))
    assert(out(256L) === ((1L, 129L, 256L - 129L)))
  }
}
