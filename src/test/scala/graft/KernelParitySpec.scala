package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.{Dot, MinHashBandKeys, SimHashBits, SortedIntersectSize}
import graft.ops.Dedup

/** Bit-parity of the native kernels against the composed built-ins forms
  * they replaced. Every claim in the kernels' scaladoc (null semantics,
  * fold order, wrap-around, concat_ws null-skipping) is asserted here by
  * evaluating BOTH forms over adversarial inputs — including the cases
  * the gate data never produces (ragged lengths, null elements, empties,
  * overflow-scale longs).
  */
class KernelParitySpec extends SparkSuite {
  import spark.implicits._

  private def composedDotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  private def composedDotDouble(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("DotLong matches interpreted aggregate/zip_with on edge inputs") {
    val rows: Seq[(Option[Seq[Option[Long]]], Option[Seq[Option[Long]]])] = Seq(
      (Some(Seq(Some(1L), Some(2L), Some(3L))), Some(Seq(Some(4L), Some(5L), Some(6L)))),
      (Some(Seq(Some(-7L), Some(11L))), Some(Seq(Some(13L), Some(-17L)))),
      (Some(Seq()), Some(Seq())),                        // empty → 0
      (Some(Seq(Some(1L))), Some(Seq())),                // ragged → null
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(1L)))), // ragged → null
      (Some(Seq(Some(1L), None)), Some(Seq(Some(1L), Some(2L)))), // null elem → null
      (None, Some(Seq(Some(1L)))),                       // null array → null
      (Some(Seq(Some(1L))), None))
    val df = rows.toDF("a", "b")
      .select(Dot.long(col("a"), col("b")).as("native"),
        composedDotLong(col("a"), col("b")).as("composed"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1), s"value mismatch: $r")
    }
  }

  test("DotLong wraps where the ANSI composed form raises (documented divergence)") {
    val df = Seq((Seq(Long.MaxValue, 2L), Seq(2L, 3L))).toDF("a", "b")
    // native: Java wrap-around — deterministic, in-domain overflow unreachable
    val native = df.select(Dot.long(col("a"), col("b"))).head().getLong(0)
    assert(native === Long.MaxValue * 2L + 6L) // wrapped value
    // composed: Spark 4 ANSI mode raises ARITHMETIC_OVERFLOW
    val thrown = intercept[Throwable] {
      df.select(composedDotLong(col("a"), col("b"))).head()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(thrown).exists(_.contains("ARITHMETIC_OVERFLOW")))
  }

  test("DotDouble is bit-identical to the interpreted left fold") {
    val rows: Seq[(Option[Seq[Option[Double]]], Option[Seq[Option[Double]]])] = Seq(
      (Some(Seq(Some(0.1), Some(0.2), Some(0.3))), Some(Seq(Some(0.7), Some(-1.3), Some(2.9)))),
      // non-associative sum: 1e16 + 1 + -1e16 ≠ reordered — fold order must match
      (Some(Seq(Some(1e16), Some(1.0), Some(-1e16))), Some(Seq(Some(1.0), Some(1.0), Some(1.0)))),
      (Some(Seq(Some(Double.MinPositiveValue), Some(1e308))), Some(Seq(Some(2.0), Some(10.0)))),
      (Some(Seq()), Some(Seq())),
      (Some(Seq(Some(1.0))), Some(Seq())),
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))),
      (None, Some(Seq(Some(1.0)))))
    val df = rows.toDF("a", "b")
      .select(Dot.double(col("a"), col("b")).as("native"),
        composedDotDouble(col("a"), col("b")).as("composed"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"bits mismatch: $r")
    }
  }

  test("SimHashBits matches the composed per-bit aggregate form") {
    def composedSimhash(hashes: Column, bits: Int): Column =
      (0 until bits).map { b =>
        val votes = aggregate(hashes, lit(0L),
          (acc, x) => acc + when(shiftright(x, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        when(votes > 0, lit(1L) * (1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    val rows: Seq[Option[Seq[Option[Long]]]] = Seq(
      Some(Seq(Some(0xdeadbeefL), Some(0x12345L), Some(0xffffL))),
      Some(Seq(Some(-1L), Some(Long.MinValue), Some(Long.MaxValue))),
      Some(Seq(Some(7L))),
      Some(Seq(Some(5L), None, Some(5L))), // null elem votes -1 on every bit
      Some(Seq()),                         // empty → 0
      None)                                // null array → 0 (not null)
    val df = rows.toDF("h")
      .select(SimHashBits(col("h"), 16).as("native"),
        composedSimhash(col("h"), 16).as("composed"))
    df.collect().foreach { r =>
      assert(!r.isNullAt(0), s"native simhash must never be null: $r")
      assert(!r.isNullAt(1), s"composed simhash null: $r")
      assert(r.getLong(0) === r.getLong(1), s"value mismatch: $r")
    }
  }

  test("MinHashBandKeys matches the composed signature -> band-key pipeline") {
    val bands = 4; val rows = 3; val seed = "mh"
    def composed(sh: Column): Column =
      Dedup.lshBandKeys(
        Dedup.minhashSignature(sh, bands * rows, seed, portable = true), bands, rows)
    val input: Seq[Option[Seq[Option[String]]]] = Seq(
      Some(Seq(Some("quick brown"), Some("brown fox"), Some("fox jumps"))),
      Some(Seq(Some("a"))),
      Some(Seq(Some(""), Some("x y"), Some("ünïcödé ş"))),
      Some(Seq(Some("dup"), Some("dup"))),
      Some(Seq(Some("tok"), None)), // null shingle skipped by array_min
      Some(Seq()),                  // empty → every band = md5("")
      None)                         // null array → null
    val df = input.toDF("sh")
      .select(MinHashBandKeys(col("sh"), bands, rows, seed).as("native"),
        composed(col("sh")).as("composed"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"keys mismatch: $r")
    }
  }

  test("SortedIntersectSize matches size(array_intersect) on sorted-distinct input") {
    val rows: Seq[(Option[Seq[String]], Option[Seq[String]])] = Seq(
      (Some(Seq("a", "b", "c")), Some(Seq("b", "c", "d"))),
      (Some(Seq("a", "b")), Some(Seq("c", "d"))),
      (Some(Seq("x")), Some(Seq("x"))),
      (Some(Seq()), Some(Seq("a"))),
      (Some(Seq()), Some(Seq())),
      (None, Some(Seq("a"))),
      (Some(Seq("a")), None))
    val prep = (c: Column) => sort_array(array_distinct(c))
    val df = rows.toDF("a", "b")
      .select(SortedIntersectSize(prep(col("a")), prep(col("b"))).as("native"),
        size(array_intersect(prep(col("a")), prep(col("b")))).as("composed"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getInt(0) === r.getInt(1), s"value mismatch: $r")
    }
  }

  test("sub-blocked jaccardPairs returns exactly the single-reducer result") {
    // one shared block = worst-case skew: every pair meets on one join key
    // unless the triangular decomposition spreads them
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 30).map(i => s"t$i")
    val docs = (0L until 60L).map { id =>
      (id, rnd.shuffle(vocab).take(8 + rnd.nextInt(10)))
    }.toDF("doc_id", "_toks")
    def run(s: Int) =
      Dedup.jaccardPairs(docs, "doc_id", "_toks", lit(1), 0.3, subBlocks = s)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = run(1)
    assert(plain.nonEmpty, "fixture should produce at least one qualifying pair")
    assert(run(4) === plain)
    assert(run(7) === plain) // s not dividing the id space evenly
    assert(run(0) === plain) // auto-tuned s is result-invariant too
  }

  test("sub-blocked cosinePairs returns exactly the single-reducer result") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 50L).map { id =>
      (id, Seq.fill(16)(rnd.nextDouble() * 2 - 1).map(_.toFloat))
    }.toDF("vec_id", "embedding")
    def run(s: Int) =
      graft.ops.Similarity.cosinePairs(vecs, "vec_id", "embedding", lit(1), 0.1, subBlocks = s)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = run(1)
    assert(plain.nonEmpty, "fixture should produce at least one qualifying pair")
    assert(run(5) === plain)
  }

  test("UnicodeNormalize matches java.text.Normalizer across forms, nulls, and codegen") {
    import graft.functions.UnicodeNormalize
    val cases = Seq(
      "café",        // decomposed → composes under NFC
      "café",         // already composed → NFC no-op
      "naïve",       // combining diaeresis
      "ﬁle",          // ﬁ ligature: NFC keeps, NFKC expands to "fi"
      "① circled",    // ① : NFKC → "1"
      "ascii only", "")
    val df = (cases.map(Option(_)) :+ None).toDF("s")
    Seq("NFC", "NFD", "NFKC", "NFKD").foreach { form =>
      val out = df.select(col("s"), UnicodeNormalize(col("s"), form).as("n"))
        .collect()
      out.foreach { r =>
        val expect = Option(r.getString(0))
          .map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.valueOf(form)))
          .orNull
        assert(r.getString(1) === expect, s"form=$form in=${r.getString(0)}")
      }
    }
    // semantic spot checks
    val nfc = df.select(UnicodeNormalize(col("s"), "NFC")).collect().map(_.getString(0))
    assert(nfc(0) === "café" && nfc(0) === nfc(1))
    val nfkc = df.select(UnicodeNormalize(col("s"), "NFKC")).collect().map(_.getString(0))
    assert(nfkc(3) === "file" && nfkc(4) === "1 circled")
    // bad form rejected at analysis
    intercept[Exception] {
      df.select(UnicodeNormalize(col("s"), "NFX")).collect()
    }
  }

  test("SortedIntersectSize randomized parity with hash-set intersection") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 40).map(i => s"w$i")
    val cases = (0 until 200).map { _ =>
      val a = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size)).toSeq
      val b = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size)).toSeq
      (a, b, a.toSet.intersect(b.toSet).size)
    }
    val df = cases.toDF("a", "b", "expected")
      .select(SortedIntersectSize(
        sort_array(array_distinct(col("a"))),
        sort_array(array_distinct(col("b")))).as("native"), col("expected"))
    df.collect().foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }
}
