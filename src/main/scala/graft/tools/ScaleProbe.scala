package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}
import graft.functions.TextAnalysis

/** One-off 10x scale probe (dev): documents/embeddings replicated 10x with
  * perturbed ids; times the quadratic-risk operators. */
object ScaleProbe {

  /** A6 decision refresh (round-10 verdict #5): the round-9 bench that
    * justified "no custom Aggregator" predates the q01/q99 percentile
    * sketches computeFromFrames carries. Three shapes at 5M×32 (160M
    * values): (a) the ROUND-10 shape (two independent percentile_approx
    * sketches at accuracy 1e5) — measured 108 s, the sketch build IS the
    * cost; (b) the SHIPPED round-11 shape (ONE sketch for both tails at
    * the default 1e4 accuracy); (c) the typed-Aggregator moments fold —
    * fast but structurally unable to produce percentiles, so it stays
    * benchmark-only unless the sketches are dropped.
    */
  /** editDistancePairs at its INTENDED domain (titles/names/short
    * paragraphs — Dedup.scala scaladoc; round-12 verdict #6): pairs/s at
    * 100× the q67 gate's block size so the operator's real-world cost has
    * a recorded number like every other family. Deterministic synthetic
    * titles ~20–30 chars with enough length variance that the |len|
    * prefilter passes most candidates into the banded DP.
    */
  private def shortFieldEditProbe(spark: SparkSession,
      t: String => (=> Any) => Any): Unit =
    t("editDistancePairs SHORT-FIELD domain: 200k titles, 2000 blocks x 100") {
      val words = typedLit(Seq("alpha", "bravo", "charlie", "delta", "echo",
        "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
        "mike", "november", "oscar", "papa", "quebec", "romeo"))
      val titles = spark.range(200000L).select(
        col("id").as("doc_id"),
        concat(
          element_at(words, (pmod(xxhash64(col("id"), lit(1)), lit(18L)) + 1).cast("int")),
          lit(" "),
          element_at(words, (pmod(xxhash64(col("id"), lit(2)), lit(18L)) + 1).cast("int")),
          lit(" unit "), (col("id") % 97L).cast("string"),
          lit(" rev "), (col("id") % 7L).cast("string")).as("text"),
        pmod(col("id"), lit(2000L)).as("blk"))
      val t0 = System.nanoTime()
      val candPairs = 2000L * (100L * 99L / 2L) // block fan-out before prefilters
      val n = Dedup.editDistancePairs(titles, "doc_id", "text", col("blk"),
        maxDist = 8).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe]   surviving pairs: $n of ~$candPairs candidates, " +
        f"$sec%.2f s = ${candPairs / sec}%.0f candidate pairs/s")
    }

  private def vecStatsProbes(spark: SparkSession,
      t: String => (=> Any) => Any): Unit = {
    import spark.implicits._
    val frames = spark.range(5000000L).select(
      transform(sequence(lit(0), lit(31)),
        d => (pmod(xxhash64(col("id"), d), lit(1000L)).cast("double")
          - 500.0) / 100.0).as("v"))
      .repartition(64).cache()
    println(s"[probe] frames100x: ${frames.count()} dim=32")
    def moments = Seq(count(lit(1)).as("n"), avg("x").as("mean"),
      stddev_pop("x").as("std"), min("x").as("mn"), max("x").as("mx"))
    t("vecStats r10 shape: two percentile_approx sketches, accuracy 1e5") {
      val agg = frames.select(posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("dim")
        .agg(moments.head, (moments.tail :+
          percentile_approx(col("x"), lit(0.01), lit(100000)).as("q01") :+
          percentile_approx(col("x"), lit(0.99), lit(100000)).as("q99")): _*)
        .orderBy("dim").collect()
      println(f"[probe]   dim0 mean=${agg.head.getDouble(2)}%.6f " +
        f"q01=${agg.head.getDouble(6)}%.4f n=${agg.head.getLong(1)}")
    }
    t("vecStats SHIPPED shape: one two-tail sketch, default 1e4 accuracy") {
      val agg = frames.select(posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("dim")
        .agg(moments.head, (moments.tail :+
          percentile_approx(col("x"), array(lit(0.01), lit(0.99)),
            lit(10000)).as("qq")): _*)
        .orderBy("dim").collect()
      println(f"[probe]   dim0 mean=${agg.head.getDouble(2)}%.6f " +
        f"q01=${agg.head.getAs[Seq[Double]]("qq").head}%.4f " +
        f"n=${agg.head.getLong(1)}")
    }
    t("vecStats typed Aggregator single pass (moments only — no sketch)") {
      val agg = new VecStatsAgg(32)
      val row = frames.as[Seq[Double]].select(agg.toColumn).head()
      println(f"[probe]   dim0 mean=${row(1) / row(0)}%.6f n=${row(0).toLong}")
    }
    t("vecStats SHIPPED r11 shape: moments pass + fixed-width histogram tails") {
      // the exact computeFromFrames decomposition over a synthetic frame
      // table (it expects the episode schema, so replay its two passes)
      val dims = frames.select(posexplode(col("v")).as(Seq("dim", "x")))
      val agg = dims.groupBy("dim")
        .agg(count(lit(1)).as("n"), avg("x").as("mean"),
          stddev_pop("x").as("std"), min("x").as("mn"), max("x").as("mx"))
        .orderBy("dim").collect()
      val ranges = spark.createDataFrame(agg.map(r =>
        (r.getAs[Int]("dim"), r.getAs[Double]("mn"), r.getAs[Double]("mx")))
        .toSeq).toDF("dim", "_lo", "_hi")
      val bins = graft.stages.Stats.HistBins
      val b = least(lit(bins - 1), greatest(lit(0),
        when(col("_hi") > col("_lo"),
          floor((col("x") - col("_lo")) / (col("_hi") - col("_lo")) * bins)
            .cast("int")).otherwise(lit(0))))
      val hist = dims.join(broadcast(ranges), "dim")
        .groupBy(col("dim"), b.as("_b")).agg(count(lit(1)).as("_c"))
        .collect()
      println(s"[probe]   hist cells: ${hist.length} " +
        s"(grid max ${32 * bins}); dim0 mean=${agg.head.getDouble(2)}")
    }
    frames.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val behaviorOnly = args.contains("behavior") // dev: tail entries only
    val r9Only = args.contains("r9")             // dev: round-9 entries only
    val sf = "/root/testdata/sf0.1"
    val docs0 = spark.read.parquet(s"$sf/documents.parquet")
    val n0 = docs0.count()
    // offset by n0, not a round constant: keeps doc ids DENSE 0-based at
    // 10×, which vocabGrowth's precondition now asserts
    val docs = (0 until 10).map { r =>
      docs0.select((col("doc_id") + lit(r * n0)).as("doc_id"),
        concat(col("text"), lit(s" v$r")).as("text"), col("n_chars"), col("lang"))
    }.reduce(_ unionByName _).repartition(64).cache()
    println(s"[probe] docs: ${docs.count()} (from $n0)")
    // same fixed single-thread CPU probe as Bench: a degraded host shows up
    // as a calib cliff next to the step timing instead of silently
    // inflating it (rounds 2-4 lesson)
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      var acc = 0L; var i = 0L
      while (i < 20000000L) { acc = acc * 6364136223846793005L + i; i += 1 }
      if (acc == 42L) System.err.println("")
      (System.nanoTime() - t0) / 1e9
    }
    calibrate(); calibrate() // JIT the probe loop
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"(calib ${calibrate()}%.3f s)"); r
    }
    // round-10: the one mapPartitions surface family with no probe entry
    // (Probe.ffprobe subprocess fan-out + Media decode chain). Run with
    //   PATH=/tmp/graft_fakebin:$PATH tools/run_verify.sh graft.tools.ScaleProbe media
    // where /tmp/graft_fakebin/ffprobe is a stub that prints fixed stream
    // JSON — the measurement is subprocess spawn + JSON parse + row
    // plumbing, exactly the part that is ours (codec cost is the codec's).
    if (args.contains("media")) {
      val media = graft.multimodal.Media.syntheticMediaFromDocs(docs)
        .repartition(64).cache()
      println(s"[probe] media blobs: ${media.count()}")
      t("decodeFrames→resizeFeatures 50k blobs (mapPartitions fake codec)") {
        val r = graft.multimodal.Media.resizeFeatures(spark,
          graft.multimodal.Media.decodeFrames(spark, media), 16)
        println(s"[probe]   frames: ${r.count()}")
      }
      t("byteStats 50k blobs (pure column pass, no decode)") {
        println(s"[probe]   rows: " +
          graft.multimodal.Media.byteStats(media).count())
      }
      import spark.implicits._
      val paths = (0 until 20000).map(i => s"/tmp/graft_fake_media/clip_$i.mp4")
      for (parts <- Seq(32, 128)) {
        t(s"ffprobe 20k paths / $parts partitions (JVM spawn per file)") {
          val ds = spark.createDataset(paths).repartition(parts)
          val ok = ds.mapPartitions(it =>
            it.map(p => graft.ops.Probe.ffprobe(p).isDefined))
            .filter(x => x).count()
          println(s"[probe]   probed ok: $ok / ${paths.size}" +
            (if (ok == 0) "  (stub ffprobe not on PATH?)" else ""))
        }
        t(s"ffprobe 20k paths / $parts partitions (per-partition worker)") {
          val ds = spark.createDataset(paths).repartition(parts)
          val ok = ds.mapPartitions { it =>
            val w = new graft.ops.Probe.Worker()
            Option(org.apache.spark.TaskContext.get())
              .foreach(_.addTaskCompletionListener[Unit](_ => w.close()))
            it.map(p => w.probe(p).isDefined)
          }.filter(x => x).count()
          println(s"[probe]   probed ok: $ok / ${paths.size}" +
            (if (ok == 0) "  (stub ffprobe not on PATH?)" else ""))
        }
      }
      spark.stop(); return
    }
    // round-15 broadcast query-side cap: measure (a) the guard window's
    // overhead on a legitimate query set, (b) time-to-refuse on a
    // corpus-sized queryPred — the claim under test is "O(q) with spill,
    // then a named raise, never an OOM or a silent broadcast build".
    //   tools/run_verify.sh graft.tools.ScaleProbe queryguard
    if (args.contains("queryguard")) {
      val n = 500000L
      val vecs = spark.range(n).select(col("id").as("vec_id"),
        org.apache.spark.sql.functions.array((0 until 16).map(d =>
          (pmod(xxhash64(col("id"), lit(d)), lit(1000L)).cast("float")
            / 1000f)): _*).as("embedding"))
        .repartition(64).cache()
      println(s"[probe] vectors: ${vecs.count()} x 16 dims")
      t("signLshTopK 2k queries / 500k corpus, guard ACTIVE (default cap)") {
        val r = Similarity.signLshTopK(vecs, "vec_id", "embedding",
          col("vec_id") < 2000, 5, planes = 12, seed = "qg")
        println(s"[probe]   rows: ${r.count()}")
      }
      t("same query warm (JIT'd; guard window still in the plan)") {
        val q = Similarity.signLshTopK(vecs, "vec_id", "embedding",
          col("vec_id") < 2000, 5, planes = 12, seed = "qg")
        println(s"[probe]   rows: ${q.count()}")
      }
      t("time-to-REFUSE: 500k queries vs 100k default cap (brute force)") {
        val bad = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
          lit(true), 5)
        val msg = try { bad.count(); "RETURNED (guard did not fire!)" }
        catch { case e: Throwable =>
          val m = EmptySweep.messageChain(e)
          if (m.contains("maxQueryRows")) "named refusal (maxQueryRows)"
          else s"WRONG error: ${m.take(200)}" }
        println(s"[probe]   $msg")
      }
      spark.stop(); return
    }
    // round-15 wide-dims probe: the committed testdata embeds at 64 dims,
    // but production embedding models emit 1536–4096 — and three kernel
    // families carry DIMS-proportional plan constants (sign-LSH plane
    // literals planes×dims, IVF centroid typedLits k×dims, PQ codebooks)
    // whose cost class (plan build, codegen, broadcast of the literal)
    // no existing probe measures. Claim under test: the exact scaled-int
    // kernels and the literal-carrying plans HOLD at 24× the gate dims —
    // degrade linearly, no codegen cliff, no plan-size failure.
    //   tools/run_verify.sh graft.tools.ScaleProbe widedims
    // Round-16 (verdict #7): extended to 4096 — the widest production
    // embedding models emit — where the centroid typedLits and per-row
    // ADC/dot cost quadruple again past the 1536 record. Confirms
    // linearity or documents the practical dim ceiling next to
    // maxQueryRows.
    if (args.contains("widedims")) {
      for (dims <- Seq(256, 1536, 4096)) {
        val n = 100000L
        val vecs = spark.range(n).select(col("id").as("vec_id"),
          org.apache.spark.sql.functions.transform(
            org.apache.spark.sql.functions.sequence(lit(0), lit(dims - 1)),
            d => (pmod(xxhash64(col("id"), d), lit(1000L)).cast("float")
              / 1000f)).as("embedding"))
          .repartition(64).cache()
        println(s"[probe] vectors: ${vecs.count()} x $dims dims")
        t(s"bruteForceTopK 100 queries / 100k corpus @ $dims dims (exact scaled-int)") {
          val r = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
            col("vec_id") < 100, 5)
          println(s"[probe]   rows: ${r.count()}")
        }
        t(s"signLshTopK 1k queries @ $dims dims (16x$dims plane literal in-plan)") {
          val r = Similarity.signLshTopK(vecs, "vec_id", "embedding",
            col("vec_id") < 1000, 5, planes = 16, seed = "wd")
          println(s"[probe]   rows: ${r.count()}")
        }
        t(s"IVF searchTopK 1k queries @ $dims dims (16x$dims centroid literals)") {
          val r = graft.ops.IvfIndex.searchTopK(vecs, "vec_id", "embedding",
            col("vec_id") < 1000, 5, nCentroids = 16, nProbe = 2, seed = "wd")
          println(s"[probe]   rows: ${r.count()}")
        }
        vecs.unpersist()
      }
      spark.stop(); return
    }
    // round-10 ops at 10–100×:
    //   tools/run_verify.sh graft.tools.ScaleProbe r10
    if (args.contains("r10")) {
      val emb0 = spark.read.parquet(s"$sf/embeddings.parquet")
      val emb = (0 until 10).map { r =>
        emb0.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"),
          transform(col("embedding"),
            x => x + lit(r.toFloat / 1000f)).as("embedding"))
      }.reduce(_ unionByName _).repartition(64).cache()
      println(s"[probe] embeddings: ${emb.count()}")
      t("kmeans lloyd k=8 iters=2, 20k×64d") {
        println("[probe]   clusters: " + graft.ops.KMeans
          .lloydAssign(emb, "vec_id", "embedding", 8, 2)
          .groupBy("cluster_id").count().count())
      }
      t("vocabGrowth 8 points, 50k docs") {
        println("[probe]   rows: " + graft.ops.Corpus
          .vocabGrowth(docs, "doc_id", "text", 8).count())
      }
      t("exactStratifiedSplit 50k docs (5 strata)") {
        println("[probe]   splits: " + graft.ops.Sampling
          .exactStratifiedSplit(docs.select("doc_id", "lang"), "lang",
            col("doc_id"), "xs1", 4, 5)
          .groupBy("lang", "split").count().count())
      }
      t("weightedMedian 50k docs") {
        println("[probe]   rows: " + graft.ops.Quantiles
          .weightedMedian(docs, "lang", "n_chars", "n_chars").count())
      }
      // sweep-line at 100×: 10 M synthetic half-open intervals
      val iv = spark.range(10000000L).select(
        ((col("id") * 7919L) % 100000000L).as("s"))
        .select(col("s"), (col("s") + 1L + (col("s") * 104729L) % 600L).as("e"))
        .repartition(64).cache()
      println(s"[probe] intervals: ${iv.count()}")
      t("sweep peakConcurrency 10M intervals") {
        graft.ops.Sweep.peakConcurrency(iv, "s", "e").collect()
          .foreach(r => println(s"[probe]   peak=${r.getLong(0)}"))
      }
      spark.stop(); return
    }
    // round-11: probes for the round-10 batch 3-7 newcomers (verdict #2):
    //   tools/run_verify.sh graft.tools.ScaleProbe r11
    if (args.contains("r11")) {
      import spark.implicits._
      // CUSUM over a 1M-period grid (≈2700 years of daily periods — far
      // past any real grid): the op's windows are GLOBAL-order over the
      // grid by design (grid-sized ≪ event-log-sized), so this measures
      // the single-reducer ceiling of that design decision.
      val grid = spark.range(1000000L).select(col("id").as("p"),
        (pmod(xxhash64(col("id")), lit(1000L)) + 1L).as("n"))
        .repartition(64).cache()
      println(s"[probe] cusum grid: ${grid.count()}")
      t("cusum 1M-period grid (global-order window)") {
        val r = graft.ops.TimeSeries.cusum(grid, "p", "n", 1, 100)
        println(s"[probe]   alarms: ${r.agg(sum("is_alarm")).head().getLong(0)}")
      }
      // Mann-Whitney over 10M values (100× the gate): two-pass PrefixSum,
      // no global window — the whole test is distinct-value-table-sized.
      val mw = spark.range(10000000L).select(
        (pmod(xxhash64(col("id")), lit(100000L)).cast("double") / 100.0).as("v"),
        (col("id") % 3 === 0).as("in_a")).repartition(64).cache()
      println(s"[probe] mann-whitney rows: ${mw.count()}")
      t("mannWhitney 10M rows (~100k distinct values)") {
        graft.ops.RankTest.mannWhitney(mw, col("v"), col("in_a"))
          .collect().foreach(r => println(s"[probe]   $r"))
      }
      // jsDrift at 10×: 500k docs, vocab-sized joins — one corpus shuffle.
      t("jsDrift 500k docs by lang") {
        println("[probe]   rows: " +
          graft.ops.Corpus.jsDrift(docs, "lang", "text").count())
      }
      // Personalized PageRank at 10×: a 2M-node synthetic graph — ABOVE
      // the 1M-node broadcast ceiling, so this runs the keyed-join
      // fallback regime at scale (verdict #4's missing measurement).
      val m = 6000000L
      val ed = spark.range(m).select(
          pmod(xxhash64(col("id"), lit(1)), lit(2000000L)).as("src"),
          pmod(xxhash64(col("id"), lit(2)), lit(2000000L)).as("dst"))
        .where(col("src") =!= col("dst"))
      val und = ed.unionByName(
        ed.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(64).cache()
      println(s"[probe] ppr edges (sym): ${und.count()}")
      val seeds = spark.range(2000000L).select(col("id").as("v"))
        .where(pmod(xxhash64(col("id"), lit(1)), lit(2000000L)) >= 0 &&
          col("id") % 1000 === 0)
        // seeds must be graph nodes: intersect with actual sources
        .join(und.select(col("src").as("v")).distinct(), Seq("v"), "left_semi")
      t("personalized pagerank 2M nodes / 12M edges, 3 iters (keyed-join regime)") {
        println("[probe]   rows: " + graft.ops.PageRank
          .personalized(und, "src", "dst", seeds, 3).count())
      }
      // Dynamic-gap streaming sessions at 10×: replay a 10×-replicated
      // event log through the real micro-batch engine (memory sink).
      val ev0 = graft.Tables.events(spark, sf)
        .select(col("ts"), col("user_id"), col("event_type"), col("value"))
      val evDir = java.nio.file.Files.createTempDirectory("probe_ev").toString
      (0 until 10).map(r => ev0.select(col("ts"),
          (col("user_id") + lit(r * 10000000L)).as("user_id"),
          col("event_type"), col("value")))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(evDir)
      t("dynamicSessionAgg 10x events through the micro-batch engine") {
        val src = spark.readStream
          .schema("ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
          .parquet(evDir)
        val q = graft.streaming.EventStream.dynamicSessionAgg(src)
          .writeStream.format("memory").queryName("_probe_dyn")
          .outputMode("append").start()
        q.processAllAvailable(); q.stop(); q.awaitTermination()
        println("[probe]   sessions: " +
          spark.table("_probe_dyn").count())
      }
      // MMR at 100×: k=50 over a 2M-vector candidate pool. Greedy MMR is
      // k sequential corpus passes WITH a per-round localCheckpoint of the
      // candidate table — the probe prints s/round so the candidate-pool
      // cap guidance below is a measured number, not a guess.
      val emb0 = spark.read.parquet(s"$sf/embeddings.parquet")
      val embN = emb0.count()
      val emb100 = (0 until 100).map { r =>
        emb0.select((col("vec_id") + lit(r * embN)).as("vec_id"),
          transform(col("embedding"), x => x + lit(r.toFloat / 997f))
            .as("embedding"))
      }.reduce(_ unionByName _).repartition(64).cache()
      println(s"[probe] mmr candidates: ${emb100.count()}")
      t("mmrTopK k=50 over 2M candidates (k driver-looped rounds)") {
        println("[probe]   picks: " + graft.ops.Diversify
          .mmrTopK(emb100, "vec_id", "embedding", 0L, 50, 0.5).count())
      }
      vecStatsProbes(spark, t)
      spark.stop(); return
    }
    if (args.contains("vecstats")) {
      vecStatsProbes(spark, t); spark.stop(); return
    }
    if (args.contains("editshort")) {
      shortFieldEditProbe(spark, t); spark.stop(); return
    }
    if (!behaviorOnly && !r9Only) {
    val toks = docs.withColumn("_toks", array_distinct(TextAnalysis.tokens(col("text"))))
    t("jaccardPairs 50k docs (blocked)") {
      val n = Dedup.jaccardPairs(toks, "doc_id", "_toks", expr("n_chars DIV 64"), 0.6).count()
      println(s"[probe]   pairs: $n")
    }
    t("jaccardPairs 50k docs subBlocks=auto") {
      val n = Dedup.jaccardPairs(toks, "doc_id", "_toks", expr("n_chars DIV 64"), 0.6, subBlocks = 0).count()
      println(s"[probe]   pairs: $n")
    }
    val sh = docs.withColumn("_sh", graft.functions.WordShinglesExpr(col("text"), 2))
    val lshPairs = t("minhashLsh 50k docs") {
      val p = Dedup.minhashLshPairs(sh, "doc_id", "_sh", 4, 3, "mh", 0.5)
        .localCheckpoint()
      println(s"[probe]   pairs: ${p.count()}")
      p
    }
    // duplicate-spam hazard case (round-7 verdict #1): 10k copies of ONE
    // doc — every band bucket holds all 10k rows, ~50M pairs that an
    // unguarded band join would push through 4 reducers; the per-bucket
    // sub-chunking must spread them over ~s²=400 chunk-pairs per band
    val spam = spark.range(10000L).select(
        (col("id") + 90000000L).as("doc_id"),
        lit("viral copy pasta spreads everywhere online fast again").as("text"))
      .withColumn("_sh", graft.functions.WordShinglesExpr(col("text"), 2))
      .unionByName(sh.limit(5000).select("doc_id", "text", "_sh"))
      .repartition(64).cache()
    println(s"[probe] spam corpus: ${spam.count()}")
    t("minhashLsh duplicate spam: 10k copies of one doc (+5k normal)") {
      val n = Dedup.minhashLshPairs(spam, "doc_id", "_sh", 4, 3, "mh", 0.5).count()
      println(s"[probe]   pairs: $n (spam cluster alone = ${10000L * 9999L / 2})")
    }
    t("simhashHamming duplicate spam: 10k identical signatures (+5k normal)") {
      val sigs = spam.select(col("doc_id"),
        Dedup.simhash(TextAnalysis.tokens(col("text")), 60, "sh",
          portable = false).as("_s"))
      val n = Dedup.simhashHammingPairs(sigs, "doc_id", "_s", 60, 3).count()
      println(s"[probe]   pairs: $n")
    }
    t("crossMinhashLsh duplicate spam: 10k-copy batch vs 5k corpus + 1k copies") {
      val corpus = spam.filter(col("doc_id") < 90000000L)
        .unionByName(spam.filter(col("doc_id") >= 90000000L).limit(1000))
      val batch = spam.filter(col("doc_id") >= 90000000L)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"), col("_sh"))
      val n = Dedup.crossMinhashLshPairs(corpus, batch, "doc_id", "_sh",
        4, 3, "mh", 0.5).count()
      println(s"[probe]   cross pairs: $n")
    }
    spam.unpersist()
    t("cluster the 50k-doc LSH pair set (alternatingStar)") {
      val labels = graft.ops.Cluster.alternatingStar(lshPairs, "id_a", "id_b")
      println(s"[probe]   nodes: ${labels.count()}, components: " +
        labels.select("cluster").distinct().count())
    }
    t("q49 gate shape at 10x: Cluster.clusters over all 50k docs") {
      val c = graft.ops.Cluster.clusters(docs, "doc_id", lshPairs, "id_a", "id_b")
      println(s"[probe]   rows: ${c.count()}, canonical: " +
        c.filter(col("is_canonical")).count())
    }
    // 100× closure probe (round-7 verdict #6): q49/q97's cost ceiling is
    // the near-dup graph itself, so push the closure two orders past the
    // sf0.1 pair set (1M) with adversarial component shapes — a 2M-node
    // CHAIN (diameter 2M: label propagation would need 2M rounds), a
    // 2M-node random tree, and a 2M-edge random background. The per-round
    // hook prints edge count (= next round's shuffle volume) and seconds:
    // O(log n) rounds with shrinking work is the pass criterion.
    t("alternatingStar 100×: 6M edges, 2M-node chain + tree + random mega-components") {
      val chainE = spark.range(1999999L)
        .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
      val treeE = spark.range(1L, 2000000L)
        .select((col("id") + 2000000L).as("id_a"),
          (pmod(xxhash64(col("id")), col("id")) + 2000000L).as("id_b"))
      val rndE = spark.range(2000000L).select(
        (pmod(xxhash64(col("id"), lit(1)), lit(2000000L)) + 4000000L).as("id_a"),
        (pmod(xxhash64(col("id"), lit(2)), lit(2000000L)) + 4000000L).as("id_b"))
      val edges = chainE.unionByName(treeE).unionByName(rndE)
      val labels = graft.ops.Cluster.alternatingStar(edges, "id_a", "id_b",
        onRound = (r, e, s) => println(f"[probe]   round $r%2d: $e%9d edges ($s%5.1f s)"))
      println(s"[probe]   nodes: ${labels.count()}, components: " +
        labels.select("cluster").distinct().count())
    }
    t("cluster 2M-node / 5M-edge random graph (alternatingStar)") {
      val e = spark.range(5000000L).select(
        pmod(xxhash64(col("id"), lit(1)), lit(2000000L)).as("id_a"),
        pmod(xxhash64(col("id"), lit(2)), lit(2000000L)).as("id_b"))
      val labels = graft.ops.Cluster.alternatingStar(e, "id_a", "id_b")
      println(s"[probe]   nodes: ${labels.count()}, components: " +
        labels.select("cluster").distinct().count())
    }
    t("prefix sum over 50M rows") {
      val df = spark.range(50000000L)
        .select(col("id").as("k"), (col("id") % 97).as("v"))
      val n = graft.ops.PrefixSum.exclusive(df, "k", "v", "off").count()
      println(s"[probe]   rows: $n")
    }
    t("corpus ops on 50k docs: inverted index / PMI / TVD drift") {
      val idx = graft.ops.Corpus.invertedIndex(docs, "doc_id", "text", minDf = 5L)
      println(s"[probe]   index terms: ${idx.count()}")
      val pmi = graft.ops.Corpus.pmiCollocations(docs, "text", minCount = 5L, topK = 20)
      println(s"[probe]   collocations: ${pmi.count()}")
      val tvd = graft.ops.Corpus.groupDriftTvd(docs, "lang", "text")
      println(s"[probe]   drift groups: ${tvd.count()}")
    }
    t("editDistancePairs 50k docs (prefix blocks)") {
      val n = Dedup.editDistancePairs(docs, "doc_id", "text",
        substring(col("text"), 1, 40), maxDist = 16).count()
      println(s"[probe]   pairs: $n")
    }
    shortFieldEditProbe(spark, t)
    t("repetition signals (modeCount fold) over 50k docs") {
      val n = docs.select(TextAnalysis.modeCount(
        TextAnalysis.tokens(col("text"))).as("m")).agg(max("m")).head().getLong(0)
      println(s"[probe]   max mode: $n")
    }
    t("pagerank 6 iters on 2M-node / 5M-edge graph") {
      val e = spark.range(5000000L).select(
        pmod(xxhash64(col("id"), lit(1)), lit(2000000L)).as("src"),
        pmod(xxhash64(col("id"), lit(2)), lit(2000000L)).as("dst"))
      val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      val pr = graft.ops.PageRank.run(sym, "src", "dst", 6)
      println(s"[probe]   nodes ranked: ${pr.count()}")
    }
    t("z-order 50M rows (interleave + range layout)") {
      val df = spark.range(50000000L).select(
        (col("id") % 65536L).as("x"), ((col("id") * 31L) % 65536L).as("y"))
      val n = graft.ops.ZOrder.layoutByZ(df, "x", "y", numFiles = 64).count()
      println(s"[probe]   rows: $n")
    }
    t("decontaminate 50k docs vs ~2.7% benchmark (5-grams)") {
      val n = graft.ops.Curation.decontaminate(docs, "doc_id",
        graft.functions.WordShinglesExpr(col("text"), 5),
        graft.functions.Hashing.hash60(col("doc_id").cast("string"), "bench") % 37 === 0)
        .count()
      println(s"[probe]   contaminated: $n")
    }
    t("duplicateSpans 50k docs (8-token spans)") {
      val n = graft.ops.Curation.duplicateSpans(docs, "doc_id",
        graft.functions.WordShinglesExpr(col("text"), 8)).count()
      println(s"[probe]   docs: $n")
    }
    t("tokenBudgetSelect over 5M synthetic docs (distributed prefix sum)") {
      val df = spark.range(5000000L).select(col("id").as("doc_id"),
        (pmod(xxhash64(col("id")), lit(1000L)).cast("double") / 1000.0).as("score"),
        (pmod(xxhash64(col("id"), lit(7)), lit(900L)) + 100L).as("tokens"))
      val sel = graft.ops.Curation.tokenBudgetSelect(df, "doc_id",
        col("score"), col("tokens"), 500000000L)
      println(s"[probe]   selected: ${sel.filter(col("selected")).count()} of ${sel.count()}")
    }
    t("crossMinhashLsh: 5k-doc new batch vs 45k-doc corpus") {
      val shd = docs.withColumn("_shg", graft.functions.WordShinglesExpr(col("text"), 2))
      val newb = pmod(col("doc_id"), lit(10L)) === 0
      val n = Dedup.crossMinhashLshPairs(shd.filter(!newb), shd.filter(newb),
        "doc_id", "_shg", 4, 3, "inc", 0.5).count()
      println(s"[probe]   cross pairs: $n")
    }
    t("curate() end-to-end over 50k docs (normalize→dedup→quality→budget)") {
      val c = graft.ops.Curation.curate(docs, "doc_id", "text",
        graft.functions.Exact.roundPortable(
          TextAnalysis.qualityScore(col("text")), 4),
        size(TextAnalysis.tokens(col("text"))), 0.5, 1000000L)
      println(s"[probe]   survivors: ${c.count()}, selected: " +
        c.filter(col("selected")).count())
    }
    t("bm25 + unigramLogProb over 50k docs") {
      val b = graft.ops.Scoring.bm25(docs, "doc_id",
        TextAnalysis.tokens(col("text")), Seq("hash", "scan", "merge")).count()
      val u = graft.ops.Scoring.unigramLogProb(docs, "doc_id",
        TextAnalysis.tokens(col("text"))).count()
      println(s"[probe]   bm25 rows: $b, lm-scored docs: $u")
    }
    t("prioritySample top-100/group over 5M weighted rows") {
      val df = spark.range(5000000L).select(col("id"),
        (pmod(xxhash64(col("id")), lit(20L))).as("grp"),
        (pmod(xxhash64(col("id"), lit(3)), lit(1000L)) + 1L).as("w"))
      val n = graft.ops.Sampling.prioritySample(df, col("id"), col("w"),
        "pp", 100, Seq("grp")).count()
      println(s"[probe]   sampled: $n")
    }
    t("dedupPassagesKeepFirst 50k docs (16-token passages)") {
      val n = graft.ops.Boilerplate.dedupPassagesKeepFirst(docs, "doc_id",
        TextAnalysis.tokens(col("text")), 16).count()
      println(s"[probe]   docs rebuilt: $n")
    }
    t("sparseCosinePairs 50k docs (df cap 10% of N)") {
      val n = graft.ops.TfIdf.sparseCosinePairs(docs, "doc_id",
        TextAnalysis.tokens(col("text")), 100, 0.8).count()
      println(s"[probe]   pairs: $n")
    }
    t("splitLeakage audit 50k docs (LSH + hash splits)") {
      val n = graft.ops.Curation.splitLeakage(docs, "doc_id",
        graft.functions.WordShinglesExpr(col("text"), 2),
        "sp1", 0.8, 0.1, 4, 3, "mh", 0.5).count()
      println(s"[probe]   leaking pairs: $n")
    }
    t("winsorize 5M rows across 20 groups") {
      val df = spark.range(5000000L).select(col("id"),
        (pmod(xxhash64(col("id")), lit(20L))).as("grp"),
        pmod(xxhash64(col("id"), lit(5)), lit(100000L)).as("v"))
      val n = graft.ops.Curation.winsorize(df, "id", "grp", col("v"),
        0.05, 0.95).count()
      println(s"[probe]   rows: $n")
    }
    val emb0 = spark.read.parquet(s"$sf/embeddings.parquet")
    val emb = (0 until 10).map { r =>
      emb0.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _).repartition(64).cache()
    println(s"[probe] embeddings: ${emb.count()}")
    t("centroid-sim 50k vecs (q133 shape: explode+groupBy → k² pairwise)") {
      val sums = emb.select(col("label"),
          posexplode(Similarity.scaled(col("embedding"))).as(Seq("dim", "v")))
        .groupBy("label", "dim").agg(sum("v").as("s"))
      val cent = sums.groupBy("label")
        .agg(transform(sort_array(collect_list(struct(col("dim"), col("s")))),
          x => x("s")).as("c"))
      val a = cent.select(col("label").as("la"), col("c").as("ca"))
      val b = cent.select(col("label").as("lb"), col("c").as("cb"))
      val n = a.join(b, col("la") < col("lb"))
        .select(Similarity.dotScaled(col("ca"), col("cb"))).count()
      println(s"[probe]   centroid pairs: $n")
    }
    t("signLshTopK 50k vecs") {
      val n = Similarity.signLshTopK(emb, "vec_id", "embedding",
        col("vec_id") % 250 === 0, 5, 4, "lsh1").count()
      println(s"[probe]   rows: $n")
    }
    t("semanticDedup 50k vecs (label-blocked cosine + closure + keep)") {
      val sc = Similarity.scaled(col("embedding"))
      val d = Dedup.semanticDedup(emb, "vec_id", "embedding", col("label"),
        0.35, Similarity.dotScaled(sc, sc))
      println(s"[probe]   rows: ${d.count()}, kept: ${d.filter(col("kept")).count()}")
    }
    t("dbscan 50k vecs (label-blocked eps-graph, 10 identical replicas/point)") {
      // the replicated corpus is the dense-blob hazard case: every point
      // has ≥9 cos=1.0 copies, so everything clusters — the probe times
      // the eps-graph (sub-chunked), the core-core closure, and the
      // corpus-sized border/noise join under maximum density
      val d = graft.ops.Density.dbscan(emb, "vec_id", "embedding",
        col("label"), 0.35, 3, subBlocks = 8)
      val roles = d.groupBy("role").count().collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
      println(s"[probe]   $roles")
    }
    t("bpeTrain 12 merges over 50k docs (vocab-sized rounds)") {
      val (m, vocab) = graft.ops.BpeTrain.train(
        graft.ops.BpeTrain.wordFreq(docs, "text"), 12)
      vocab.unpersist(blocking = false)
      println(s"[probe]   merges: ${m.size}, last: ${m.lastOption.getOrElse("-")}")
    }
    t("simhashHammingPairs 50k docs (60-bit sigs, 15-bit pigeonhole bands)") {
      // production config: wide signatures keep band buckets sparse
      // (50k docs / 2^15 buckets ≈ 1.5 per bucket) — the 16-bit gate
      // config is the oracle-mirrorable small-space variant
      val sigs = docs.select(col("doc_id"),
        Dedup.simhash(TextAnalysis.tokens(col("text")), 60, "sh",
          portable = false).as("_sh"))
      val n = Dedup.simhashHammingPairs(sigs, "doc_id", "_sh", 60, 3).count()
      println(s"[probe]   pairs: $n")
    }
    t("mooreLewis selection over 50k docs") {
      val n = graft.ops.Scoring.mooreLewis(docs, "doc_id",
        TextAnalysis.tokens(col("text")),
        pmod(col("doc_id"), lit(10L)) < 2).filter(col("selected")).count()
      println(s"[probe]   selected: $n")
    }
    t("vocabCoverage (top-1000 vocab) over 50k docs") {
      val n = graft.ops.Corpus.vocabCoverage(docs, "doc_id", "text", 1000)
        .agg(sum("oov")).head().getLong(0)
      println(s"[probe]   total OOV occurrences: $n")
    }
    t("epochShuffle 5M rows (distributed rank)") {
      val df = spark.range(5000000L).select(col("id"))
      val n = graft.ops.Sampling.epochShuffle(df, col("id"), "ep", 64)
        .agg(max("pos")).head().getLong(0)
      println(s"[probe]   max pos: $n")
    }
    t("capSourceShare 5M rows / 20 groups") {
      val df = spark.range(5000000L).select(col("id"),
        pmod(xxhash64(col("id")), lit(20L)).cast("string").as("src"),
        (pmod(xxhash64(col("id"), lit(3)), lit(1000L)) + 1L).as("w"))
      val c = graft.ops.Curation.capSourceShare(df, "id", "src", col("w"), 40)
      println(s"[probe]   kept: ${c.filter(col("kept")).count()} of ${c.count()}")
    }
    t("bloom semiJoin 50M-row probe side vs 1M-key set (1% fpp)") {
      val big = spark.range(50000000L).select(col("id"),
        pmod(xxhash64(col("id"), lit(11)), lit(10000000L)).as("key"))
      val keys = spark.range(1000000L)
        .select((col("id") * 10L).as("k")) // ~10% of the key domain
      val n = graft.ops.BloomJoin.semiJoin(big, col("key"), keys, col("k"),
        expectedItems = 1000000L).count()
      println(s"[probe]   survivors: $n")
    }
    t("pqCodes 50k vecs (8 subspaces x 16 centroids, map-only)") {
      val cents = graft.ops.Quantize.pqSeedCentroids(emb, "vec_id", "embedding", 8, 16)
      val q = graft.ops.Quantize.pqCodes(emb, "vec_id", "embedding", cents)
      println(s"[probe]   coded: ${q.count()}, mean qerr: " +
        q.agg(avg(col("qerr_scaled"))).head().getDouble(0).toLong)
    }
    t("adcTopK 50k vecs x 50 queries (LUT scan)") {
      val cents = graft.ops.Quantize.pqSeedCentroids(emb, "vec_id", "embedding", 8, 16)
      val n = graft.ops.Quantize.adcTopK(emb, "vec_id", "embedding", cents,
        pmod(col("vec_id"), lit(1000L)) === 7, 10).count()
      println(s"[probe]   result rows: $n")
    }
    t("dsirSelect 50k docs (4096 buckets, Gumbel-top-1000)") {
      val d = graft.ops.Scoring.dsirSelect(docs, "doc_id",
        TextAnalysis.tokens(col("text")), pmod(col("doc_id"), lit(5L)) === 0,
        4096, 1000)
      println(s"[probe]   scored: ${d.count()}, selected: " +
        d.filter(col("selected")).count())
    }
    t("ccnetBuckets 50k docs (per-lang LM + terciles)") {
      val b = graft.ops.Scoring.ccnetBuckets(docs, "doc_id", "lang",
        TextAnalysis.tokens(col("text")))
      println(s"[probe]   bucketed: ${b.count()}")
    }
    t("stupidBackoff 50k docs (bigram LM from 80% slice)") {
      val d = graft.ops.Scoring.stupidBackoff(docs, "doc_id",
        TextAnalysis.tokens(col("text")),
        graft.functions.Hashing.hash60(col("doc_id").cast("string"), "lm") % 5 =!= 0)
      println(s"[probe]   scored: ${d.count()}")
    }
    } // end !behaviorOnly
    if (!behaviorOnly) {
    // --- round-9 entries (round-8 verdict #6 and #7) ---
    // 10× DBSCAN: embeddings replicated 10× with per-replica perturbation
    // (same labels → blocks grow 10×, candidate pairs 100× — exactly the
    // quadratic-risk axis), hot-cell decomposition engaged (subBlocks=4).
    // Staged: the pairwise eps-neighbor stage alone, then the full run.
    val emb0 = spark.read.parquet(s"$sf/embeddings.parquet")
    val emb10 = (0 until 10).map { r =>
      emb0.select((col("vec_id") + lit(r * 1000000L)).as("vec_id"),
        col("label"),
        transform(col("embedding"),
          x => x + lit(r.toFloat) * lit(1e-4f)).as("embedding"))
    }.reduce(_ unionByName _).repartition(64).cache()
    println(s"[probe] emb10: ${emb10.count()} (labels 10, max block ~2180)")
    t("dbscan 10x stage 1: eps-neighbor cosinePairs (hot-cell subBlocks=4)") {
      val n = Similarity.cosinePairs(emb10, "vec_id", "embedding",
        col("label"), 0.30, subBlocks = 4).count()
      println(s"[probe]   pairs: $n")
    }
    t("dbscan 10x full: pairs + degrees + core closure + border attach") {
      val d = graft.ops.Density.dbscan(emb10, "vec_id", "embedding",
        col("label"), 0.30, 3, subBlocks = 4)
      println(s"[probe]   rows: ${d.count()}, cores: " +
        d.filter(col("is_core")).count() + ", clusters: " +
        d.agg(countDistinct(col("cluster_id"))).head().getLong(0))
    }
    // 10× keep-best: q97's shape — jaccard pairs → closure → per-cluster
    // best-score window — over the full 10× doc corpus. Staged so the
    // window's own cost is visible next to the closure it rides on.
    val toks9 = docs.withColumn("_toks",
      array_distinct(TextAnalysis.tokens(col("text"))))
    val pairs9 = t("keepBest 10x stage 1: jaccardPairs (subBlocks=auto)") {
      val p = Dedup.jaccardPairs(toks9, "doc_id", "_toks",
        expr("n_chars DIV 64"), 0.6, subBlocks = 0).localCheckpoint()
      println(s"[probe]   pairs: ${p.count()}"); p
    }
    val labeled9 = t("keepBest 10x stage 2: closure + labels (Cluster.clusters)") {
      val l = graft.ops.Cluster.clusters(docs.select("doc_id"), "doc_id",
        pairs9, "id_a", "id_b").localCheckpoint()
      println(s"[probe]   rows: ${l.count()}"); l
    }
    t("keepBest 10x stage 3: per-cluster best-score window") {
      val withScore = labeled9.select(col("doc_id"), col("cluster_id"))
        .withColumn("score",
          pmod(xxhash64(col("doc_id")), lit(1000000L)).cast("double"))
      val k = graft.ops.Curation.keepBestPerCluster(withScore, "cluster_id",
        "doc_id", col("score"))
      println(s"[probe]   kept: ${k.filter(col("keep")).count()} of ${k.count()}")
    }
    // Vector-stats A6 shapes at 100× episode scale (SURVEY §4's "custom
    // Aggregator if profiling demands" item): per-dimension
    // n/mean/std/min/max over 5M dim-32 frames —
    //  (a) posexplode + built-in groupBy(dim) aggs (the shipped shape:
    //      whole-stage-codegen'd, map-side partial aggregation);
    //  (b) a typed Aggregator[Array[Double], Array[Double], _] folding
    //      per-partition [n, Σ, Σ², min, max] arrays (one pass, no
    //      explode, but typed-row encoding on every input).
    val frames = spark.range(5000000L).select(
      transform(sequence(lit(0), lit(31)),
        d => (pmod(xxhash64(col("id"), d), lit(1000L)).cast("double")
          - 500.0) / 100.0).as("v"))
      .repartition(64).cache()
    println(s"[probe] frames100x: ${frames.count()} dim=32")
    t("vecStats (a) posexplode + groupBy(dim) builtins") {
      val agg = frames
        .select(posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"), avg("x").as("mean"),
          stddev_pop("x").as("std"), min("x").as("mn"), max("x").as("mx"))
        .orderBy("dim").collect()
      println(f"[probe]   dim0 mean=${agg.head.getDouble(2)}%.6f n=${agg.head.getLong(1)}")
    }
    t("vecStats (b) typed Aggregator single pass") {
      import spark.implicits._
      val agg = new VecStatsAgg(32)
      val row = frames.as[Seq[Double]].select(agg.toColumn).head()
      println(f"[probe]   dim0 mean=${row(1) / row(0)}%.6f n=${row(0).toLong}")
    }
    // new iterative graph ops at 100×: the same 2M-node / 5M-edge random
    // graph as the PageRank probe (q184/q193 must hold where q76 does)
    val bigE = spark.range(5000000L).select(
      pmod(xxhash64(col("id"), lit(1)), lit(2000000L)).as("src"),
      pmod(xxhash64(col("id"), lit(2)), lit(2000000L)).as("dst"))
    t("HITS 3 rounds on 2M-node / 5M-edge random graph") {
      val h = graft.ops.Hits.run(bigE, "src", "dst", 3)
      println(s"[probe]   nodes: ${h.count()}, nonzero auth: " +
        h.filter(col("auth_scaled") > 0).count())
    }
    t("BFS 4 hops from 1k seeds on 2M-node / 5M-edge random graph") {
      val seeds = spark.range(1000L).select(col("id").as("v"))
      val d = graft.ops.Bfs.distances(bigE, "src", "dst", seeds, 4)
      println(s"[probe]   reached: ${d.count()} by-dist: " +
        d.groupBy("dist").count().orderBy("dist").collect()
          .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" "))
    }
    t("BFS 8 hops on the 2M-node CHAIN (frontier stays 2 nodes/round)") {
      val chainE = spark.range(1999999L)
        .select(col("id").as("src"), (col("id") + 1L).as("dst"))
      val d = graft.ops.Bfs.distances(chainE, "src", "dst",
        spark.range(1000000L, 1000001L).select(col("id").as("v")), 8)
      println(s"[probe]   reached: ${d.count()} (expect 17)")
    }
    } // end round-9 entries
    if (!r9Only) {
    // 10x behavioral suite: 1M events / 15k users over 30 days (same shape
    // as the sf0.1 log, 10x rows), deterministic multiplicative-hash times
    val day = 86400000000L
    val ev10 = spark.range(0, 1000000L).select(
        col("id").as("event_id"),
        pmod(col("id") * 2654435761L, lit(15000L)).as("user_id"),
        expr(s"timestamp_micros(pmod(xxhash64(id), ${30 * day}))").as("ts"),
        element_at(typedLit(Seq("view", "click", "purchase", "signup", "error")),
          (pmod(col("id") * 40503L, lit(5L)) + 1).cast("int")).as("event_type"),
        pmod(col("id") * 97L, lit(1000L)).as("item"))
      .repartition(64).cache()
    println(s"[probe] events10x: ${ev10.count()}")
    t("funnel 1M events / 15k users (one groupBy + per-user fold)") {
      val f = graft.ops.Behavior.funnel(ev10, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), 6L * 3600 * 1000000)
      println(s"[probe]   users: ${f.count()}, completed: " +
        f.filter(col("steps_completed") === 3).count())
    }
    t("retentionWeekly 1M events / 15k users") {
      println(s"[probe]   cells: ${graft.ops.Behavior.retentionWeekly(ev10, "user_id", "ts").count()}")
    }
    t("transitions 1M events (user-partitioned lag window)") {
      println(s"[probe]   cells: ${graft.ops.Behavior.transitions(ev10, "user_id", "ts", "event_type", "event_id").count()}")
    }
    t("cooccur 1M events, 1k items, cap 50 (incl. 100k-event hot user)") {
      val hot = spark.range(0, 100000L).select(lit(99999L).as("user_id"),
        pmod(col("id") * 31L, lit(1000L)).as("item"))
      val n = graft.ops.Cooccur.itemPairs(
        ev10.select("user_id", "item").unionByName(hot), "user_id", "item", 50).count()
      println(s"[probe]   pairs: $n")
    }
    // sliding window: 10M rows / 5 keys — the shape where the naive
    // one-partition-per-key RANGE window serializes and the sliced
    // decomposition must not
    val ts10 = spark.range(0, 10000000L).select(
        element_at(typedLit(Seq("a", "b", "c", "d", "e")),
          (pmod(col("id"), lit(5L)) + 1).cast("int")).as("k"),
        pmod(xxhash64(col("id")), lit(30 * day)).as("ts_us"),
        pmod(col("id"), lit(100L)).as("v"))
      .repartition(64).cache()
    println(s"[probe] slidingRows: ${ts10.count()}")
    // aggregate the window output — a bare count() lets column pruning
    // DELETE the Window operator and times only the scan
    t("slidingAgg 10M rows / 5 keys, 24h lookback (sliced prefix-sum form)") {
      val r = graft.ops.SlidingAgg.trailing(ts10, "k", col("ts_us"), col("v"),
        day, 4 * day)
      println(s"[probe]   checksum: ${r.agg(sum(col("sum_win"))).head().getLong(0)}")
    }
    // the naive RANGE-frame plan is run at 1/10 size ONLY: Spark's
    // SlidingWindowFunctionFrame rebuilds the aggregate on every lower-
    // bound advance (O(rows × frame_rows)); at 10M rows / 5 keys it burns
    // 32 cores for tens of minutes — which is precisely the measurement
    val ts1 = ts10.sample(0.1, 42).cache()
    println(s"[probe] naiveRows: ${ts1.count()}")
    t("slidingAgg naive RANGE frame at 1/10 SIZE (quadratic frame rebuilds)") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("k").orderBy("ts_us").rangeBetween(-day, 0)
      println(s"[probe]   checksum: " + ts1.withColumn("s", sum(col("v")).over(w))
        .agg(sum(col("s"))).head().getLong(0))
    }
    t("slidingAgg sliced prefix-sum form at the same 1/10 size") {
      val r = graft.ops.SlidingAgg.trailing(ts1, "k", col("ts_us"), col("v"),
        day, 4 * day)
      println(s"[probe]   checksum: ${r.agg(sum(col("sum_win"))).head().getLong(0)}")
    }
    } // end !r9Only
    spark.stop()
  }
}

/** Benchmark-only typed Aggregator (SURVEY §4 / round-8 verdict #7): the
  * candidate replacement for the posexplode A6 pooled-stats shape — one
  * pass, per-partition [n, Σ(dim), Σ²(dim), min(dim), max(dim)] buffers,
  * elementwise merge. Native (non-kryo) encoders so the comparison
  * measures the fold, not serialization overhead.
  */
final class VecStatsAgg(dim: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      Seq[Double], Array[Double], Seq[Double]] {
  override def zero: Array[Double] = {
    val b = new Array[Double](1 + 4 * dim)
    java.util.Arrays.fill(b, 1 + 2 * dim, 1 + 3 * dim, Double.PositiveInfinity)
    java.util.Arrays.fill(b, 1 + 3 * dim, 1 + 4 * dim, Double.NegativeInfinity)
    b
  }
  override def reduce(b: Array[Double], a: Seq[Double]): Array[Double] = {
    b(0) += 1
    var d = 0
    while (d < dim) {
      val x = a(d)
      b(1 + d) += x
      b(1 + dim + d) += x * x
      if (x < b(1 + 2 * dim + d)) b(1 + 2 * dim + d) = x
      if (x > b(1 + 3 * dim + d)) b(1 + 3 * dim + d) = x
      d += 1
    }
    b
  }
  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    x(0) += y(0)
    var i = 1
    while (i <= 2 * dim) { x(i) += y(i); i += 1 }
    var d = 0
    while (d < dim) {
      val im = 1 + 2 * dim + d
      val ix = 1 + 3 * dim + d
      if (y(im) < x(im)) x(im) = y(im)
      if (y(ix) > x(ix)) x(ix) = y(ix)
      d += 1
    }
    x
  }
  override def finish(b: Array[Double]): Seq[Double] = b.toSeq
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
