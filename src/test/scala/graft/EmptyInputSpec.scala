package graft

import graft.tools.EmptySweep

/** The round-12 empty-input contract, pinned: EVERY gate, run against
  * zero-row tables with the real schemas, either returns a result or
  * refuses with a deliberate, well-messaged error — never an NPE /
  * MatchError / opaque internals artifact. Operationally this is the
  * "first day a partition filter matches nothing" class; the sweep that
  * motivated it (tools/EmptySweep) found nine distinct failure modes
  * across streaming drains, write-then-read gates, plan-shape tripwires
  * and codebook builders.
  */
class EmptyInputSpec extends SparkSuite {

  private def sweep(rows: Int): Seq[String] = {
    val out = tmpDir(s"graft_degen_${rows}_spec")
    EmptySweep.writeTables(spark, "/root/testdata/sf0.001", out, rows)
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, out).count(); None }
      catch {
        case e: Throwable =>
          EmptySweep.crashIn(e) match {
            case Some(crash) =>
              Some(s"$name crashed: ${crash.getClass.getName}: " +
                s"${crash.getMessage}")
            case None => None // deliberate refusal — allowed
          }
      } finally graft.ops.Pins.releaseAll(spark)
    }
  }

  test("all gates survive zero-row inputs: return or refuse loudly") {
    val failures = sweep(0)
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("all gates survive 3-row inputs: return or refuse loudly") {
    // the shape that found MLlib's KMeansAggregator index crash (n < k)
    // and the parquet row-group-pruning false alarms in the streaming
    // tripwire/drain accounting
    val failures = sweep(3)
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("all gates survive null payloads: return or refuse loudly") {
    // identity intact, every other nullable column NULL — the shape that
    // found four getSeq NPEs (PQ seeds, PQ/ADC query slices, IVF
    // centroids, MMR candidates) and q192's ANSI divide-by-zero
    val out = tmpDir("graft_nulls_spec")
    EmptySweep.writeNullTables(spark, "/root/testdata/sf0.001", out, 3)
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, out).count(); None }
        catch {
          case e: Throwable =>
            EmptySweep.crashIn(e) match {
              case Some(crash) =>
                Some(s"$name crashed: ${crash.getClass.getName}: " +
                  s"${crash.getMessage}")
              case None => None
            }
        } finally graft.ops.Pins.releaseAll(spark)
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // ---- round-13: the NaN and hostile-unicode sweep contracts, pinned ----
  // (previously these lived only in tool-run sweep results and would not
  // have survived a refactor — round-12 verdict #5)

  private def sweepDir(write: String => Unit, prefix: String): Seq[(String, Option[Throwable], Option[Throwable])] = {
    val out = tmpDir(prefix)
    write(out)
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val r = try { fn(spark, out).count(); (None, None) }
      catch { case e: Throwable => (EmptySweep.crashIn(e), Some(e)) }
      finally graft.ops.Pins.releaseAll(spark)
      (name, r._1, r._2)
    }
  }

  test("all gates survive NaN-everywhere inputs; exact kernels refuse with the NAMED cast error") {
    val results = sweepDir(
      EmptySweep.writeNanTables(spark, "/root/testdata/sf0.001", _, 3),
      "graft_nan_spec")
    val crashes = results.collect { case (n, Some(c), _) =>
      s"$n crashed: ${c.getClass.getName}: ${c.getMessage}" }
    assert(crashes.isEmpty, crashes.mkString("\n"))
    // the engine-parity contract: NaN reaching an exact scaled-int kernel
    // RAISES the named domain error (identical to the oracle's CAST(NaN
    // AS BIGINT)) — it must never NULL-absorb into a silently-wrong sum.
    // q31's embedding kernel is the canonical site.
    val q31 = results.find(_._1 == "q31_embed_dim_stats").get
    assert(q31._3.isDefined, "q31 on NaN embeddings must refuse, not return")
    val chain = Iterator.iterate(q31._3.get)(_.getCause).takeWhile(_ != null)
      .take(10).toSeq
    assert(chain.exists(t => EmptySweep.nanDomainRefusal(t)),
      s"q31's refusal must be the named NaN cast error, got: " +
        chain.map(t => t.getClass.getName + ": " + t.getMessage).mkString(" | "))
  }

  test("constant-at-scale x300 refusal ledger: each named precondition still fires") {
    // round-13 verdict #4 (pinned r14): the x300 sweep's 7 loud refusals
    // lived only in tool output — a refactor that turned one into a
    // silent wrong answer would have passed the suite. This pins the
    // LEDGER (gate -> named error fragment) on the same table shape the
    // tool uses (first row of each sf0.001 table replicated 300x:
    // duplicate ids + 2^53-breaking constant sums), but runs ONLY the
    // seven refusing gates — the full 218-gate sweep stays tool-only
    // (~150 s at local[32]; see PLANS.md round 13/14).
    val out = tmpDir("graft_dup300_spec")
    EmptySweep.writeTables(spark, "/root/testdata/sf0.001", out, -300)
    val ledger = Seq(
      "q124_pq_adc" -> "query slice must be 1..256",
      "q131_partition_prune" -> "partition pruning ineffective",
      "q144_skew_split" -> "skew-marked SortMergeJoin",
      "q209_ivf_adc" -> "query slice must be 1..256",
      "q212_vocab_growth" -> "UNIQUE doc ids",
      "q221_personalized_pagerank" -> "non-empty seed set",
      "q223_mmr_diverse" -> "exceeds the 0 candidate")
    val problems = ledger.flatMap { case (gate, fragment) =>
      try {
        SparkEntry.queries(gate)(spark, out).count()
        // returning is the exact failure mode this pins: the
        // precondition stopped firing and the gate computes on corrupt
        // input it used to refuse
        Some(s"$gate now RETURNS on the x300 shape (silent-wrong risk)")
      } catch {
        case e: Throwable =>
          val chain = Iterator.iterate[Throwable](e)(_.getCause)
            .takeWhile(_ != null).take(10)
            .flatMap(t => Option(t.getMessage)).mkString(" | ")
          if (EmptySweep.crashIn(e).isDefined)
            Some(s"$gate CRASHED instead of refusing: $chain")
          else if (!chain.contains(fragment))
            Some(s"$gate refused with the WRONG message (want '$fragment'): $chain")
          else None
      } finally graft.ops.Pins.releaseAll(spark)
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("extreme-magnitude numerics: exact kernels refuse with NAMED overflow, text/count gates flow") {
    // round-14 ninth shape: ±MaxValue (sums → ±Inf), the smallest
    // denormal, −0.0, and 1e15 (finite, but 1e6-scaled it passes 2⁶³) in
    // every float/double column. Empirically validates the
    // micros-headroom audit: the scaled-integer kernels' documented
    // domain is |x| ≲ 9.2e12 at micros scale, and input past it raises
    // the named overflow (the r13 "loud, not wrapped" contract — the
    // finite sibling of the NaN sweep's CAST error), never a silent
    // finite result built from an Inf. Full board: 183 pass / 35 loud /
    // 0 crash (tool, ~150–220 s at local[32], re-confirmed round 15).
    //
    // Round-15 (r14 verdict #5): the FULL 35-gate refusal ledger is
    // pinned with named fragments — previously only 4 gates were
    // pinned with a catch-all, so a refactor that turned any of the
    // other 31 refusals into a silent NULL-absorbing answer (try_cast,
    // a dropped require) would have passed the suite. Fragments are
    // matched against the whole cause+suppressed message walk
    // (EmptySweep.messageChain) because AQE multi-failure and streaming
    // STREAM_FAILED wrappers bury the actual overflow one level down.
    // Each refusal is fast (0.1–2.6 s in the sweep log — the raise
    // fires before any real work), so the ledger stays inside the suite
    // budget; the 183 flowing gates stay tool-only.
    val out = tmpDir("graft_extreme_spec")
    EmptySweep.writeExtremeTables(spark, "/root/testdata/sf0.001", out)
    val overflowGates = Seq(
      // scaled-integer kernels: CAST_OVERFLOW on Inf or on the finite
      // 1e21 (= 1e15 micros-scaled), surfacing directly, through AQE
      // STAGE_MATERIALIZATION_MULTIPLE_FAILURES, or streaming
      // STREAM_FAILED
      "q107_semantic_dedup", "q110_signlsh_recall", "q111_multiprobe_recall",
      "q119_pq_codes", "q124_pq_adc", "q132_bucketed_join",
      "q133_centroid_sim", "q137_stream_restart", "q142_dbscan",
      "q145_aqe_coalesce", "q146_window_topk", "q172_sliding_window",
      "q182_extension_fusion", "q205_append_windows", "q206_append_sessions",
      "q209_ivf_adc", "q211_kmeans_lloyd", "q219_dynamic_session_gap",
      "q220_cluster_balanced_split", "q223_mmr_diverse", "q29_cosine_topk",
      "q30_embed_neardup", "q31_embed_dim_stats", "q33_streaming_hourly",
      "q34_streaming_sessions", "q36_signlsh_topk", "q37_ivf_topk",
      "q59_sliding_windows", "q73_stream_static_join", "q77_fmgws_sessions",
      "q98_hard_negatives")
    val ledger = overflowGates.map(_ -> "CAST_OVERFLOW") ++ Seq(
      "q175_interval_merge" -> "ARITHMETIC_OVERFLOW", // exact long multiply
      "q144_skew_split" -> "no skew-marked SortMergeJoin", // vacuous-plan tripwire
      "q221_personalized_pagerank" -> "non-empty seed set", // extremes empty the seed predicate
      "q70_mllib_ivf" -> "MUST NOT be NaN or Infinity") // its own finite-vector require
    val problems = ledger.flatMap { case (gate, fragment) =>
      try {
        SparkEntry.queries(gate)(spark, out).count()
        Some(s"$gate RETURNED on extreme input (silent-wrong risk)")
      } catch {
        case e: Throwable =>
          val chain = EmptySweep.messageChain(e)
          if (EmptySweep.crashIn(e).isDefined)
            Some(s"$gate CRASHED instead of refusing: $chain")
          else if (!chain.contains(fragment))
            Some(s"$gate refused with the WRONG message (want '$fragment'): $chain")
          else None
      } finally graft.ops.Pins.releaseAll(spark)
    }
    assert(problems.isEmpty, problems.mkString("\n"))
    // gates not touching doubles must FLOW through the shape
    val mustFlow = Seq("q20_text_stats", "q25_exact_dedup")
    val broken = mustFlow.flatMap { gate =>
      try { SparkEntry.queries(gate)(spark, out).count(); None }
      catch { case e: Throwable =>
        Some(s"$gate failed on extreme numerics it never reads: $e") }
      finally graft.ops.Pins.releaseAll(spark)
    }
    assert(broken.isEmpty, broken.mkString("\n"))
  }

  test("hot-key shape: per-key fold guards refuse with the NAMED cap; keyed window/funnel gates flow") {
    // round-15 tenth shape: ~all rows of each keyed table on ONE key with
    // DISTINCT payloads (the ×300 shape's complement), events replicated
    // 250× → 250k rows on one (user, type). Empirically probes the
    // Signal/Behavior full-history fold guards the same way the extreme
    // shape probed the micros-headroom predictions. Full board (tool run,
    // PLANS.md round 15): 215 pass / 3 loud / 0 crash — the sweep also
    // FOUND q171's single-class DIVIDE_BY_ZERO (fixed, pinned in
    // FeatureSelectSpec).
    val out = tmpDir("graft_hotkey_spec")
    EmptySweep.writeHotKeyTables(spark, "/root/testdata/sf0.001", out)
    val ledger = Seq(
      "q177_debounce" -> "maxEventsPerKey",
      "q178_ewma" -> "maxEventsPerKey")
    val problems = ledger.flatMap { case (gate, fragment) =>
      try {
        SparkEntry.queries(gate)(spark, out).count()
        Some(s"$gate now RETURNS on the hot-key shape (a 250k-event key " +
          "would build the non-spillable buffer unguarded)")
      } catch {
        case e: Throwable =>
          val chain = Iterator.iterate[Throwable](e)(_.getCause)
            .takeWhile(_ != null).take(10)
            .flatMap(t => Option(t.getMessage)).mkString(" | ")
          if (EmptySweep.crashIn(e).isDefined)
            Some(s"$gate CRASHED instead of refusing: $chain")
          else if (!chain.contains(fragment))
            Some(s"$gate refused with the WRONG message (want '$fragment'): $chain")
          else None
      } finally graft.ops.Pins.releaseAll(spark)
    }
    assert(problems.isEmpty, problems.mkString("\n"))
    // window-based per-key gates FLOW on the same hot key (window
    // operators spill-sort — the contrast that justifies the guards), and
    // the funnel flows because the stamped type is a non-step type (zero
    // events enter its buffer); chi2 returns its empty top-k on the
    // single-class corpus instead of DIVIDE_BY_ZERO
    val mustFlow = Seq("q168_funnel", "q181_activity_streak",
      "q170_transitions", "q171_chi2_terms")
    val broken = mustFlow.flatMap { gate =>
      try { SparkEntry.queries(gate)(spark, out).count(); None }
      catch { case e: Throwable =>
        Some(s"$gate failed on the hot-key shape: $e") }
      finally graft.ops.Pins.releaseAll(spark)
    }
    assert(broken.isEmpty, broken.mkString("\n"))
  }

  test("timewarp shape: gap-fill span cap refuses NAMED; dup-microsecond and far-range time paths flow") {
    // round-15 eleventh shape: every timestamp rotated over year 0001 /
    // epoch 0 / a duplicate-microsecond anchor (×2 in the rotation, so
    // ~40% of rows share ONE microsecond: Δt = 0 through every gap/rate/
    // fold path) / year 9999 (micros ≈ 2.5e17 — any nanos conversion or
    // micros product overflows 2⁶³ loudly). A single key's history mixes
    // year 0001 with year 9999 — the corrupt-timestamp scenario
    // gapFillHourly's maxSpanHours cap documents. Full board (tool run,
    // PLANS.md round 15): 215 pass / 3 loud / 0 crash — the louds are
    // q160 (the cap, the probe target), q144 (vacuous-plan tripwire),
    // q221 (extreme dates empty its seed predicate).
    val out = tmpDir("graft_timewarp_spec")
    EmptySweep.writeTimewarpTables(spark, "/root/testdata/sf0.001", out)
    val ledger = Seq(
      "q160_gap_fill" -> "gapFillHourly: key spans")
    val problems = ledger.flatMap { case (gate, fragment) =>
      try {
        SparkEntry.queries(gate)(spark, out).count()
        Some(s"$gate now RETURNS on the timewarp shape (a 7e7-hour span " +
          "would densify the hourly spine into OOM undetected)")
      } catch {
        case e: Throwable =>
          val chain = EmptySweep.messageChain(e)
          if (EmptySweep.crashIn(e).isDefined)
            Some(s"$gate CRASHED instead of refusing: $chain")
          else if (!chain.contains(fragment))
            Some(s"$gate refused with the WRONG message (want '$fragment'): $chain")
          else None
      } finally graft.ops.Pins.releaseAll(spark)
    }
    assert(problems.isEmpty, problems.mkString("\n"))
    // event-time paths must FLOW through Δt = 0 (no divide-by-zero on a
    // zero gap/duration) and ±10¹⁷-microsecond ranges: debounce/EWMA
    // fold a zero inter-event gap, as-of joins match on the shared
    // microsecond, streaks/SCD2/transitions span year 0001 → 9999,
    // interval merge's exact multiply stays inside 2⁶³ on real micros
    val mustFlow = Seq("q177_debounce", "q178_ewma", "q44_asof_clicks",
      "q136_asof_forward", "q181_activity_streak", "q188_scd2_runs",
      "q170_transitions", "q175_interval_merge")
    val broken = mustFlow.flatMap { gate =>
      try { SparkEntry.queries(gate)(spark, out).count(); None }
      catch { case e: Throwable =>
        Some(s"$gate failed on the timewarp shape: $e") }
      finally graft.ops.Pins.releaseAll(spark)
    }
    assert(broken.isEmpty, broken.mkString("\n"))
  }

  test("wide-dims shape: every embedding consumer flows at 1536 dims") {
    // round-15 twelfth shape: embeddings tiled to 1536 dims (the width
    // production text-embedding models emit, 24× the committed 64) with
    // magnitudes kept in-domain — width is the ONLY variable. Full board
    // (tool run, PLANS.md round 15): 216 pass / 2 loud / 0 crash; the
    // louds are the q144/q221 shape-tripwires every degenerate shape
    // trips. This pins the embedding-consumer flow subset: a
    // dims-driven assumption (a hardcoded 64, PQ sub-vector arithmetic,
    // a codegen/plan-size cliff in the planes×dims or k×dims literal
    // builds) must not appear as dims grow.
    val out = tmpDir("graft_wide_spec")
    EmptySweep.writeWideTables(spark, "/root/testdata/sf0.001", out)
    val mustFlow = Seq("q29_cosine_topk", "q31_embed_dim_stats",
      "q57_embed_quantize", "q99_random_projection", "q119_pq_codes")
    val broken = mustFlow.flatMap { gate =>
      try { SparkEntry.queries(gate)(spark, out).count(); None }
      catch { case e: Throwable =>
        Some(s"$gate failed at 1536 dims: $e") }
      finally graft.ops.Pins.releaseAll(spark)
    }
    assert(broken.isEmpty, broken.mkString("\n"))
    // the dims actually took effect: q31 emits one row per dimension
    val dimRows = SparkEntry.queries("q31_embed_dim_stats")(spark, out).count()
    graft.ops.Pins.releaseAll(spark)
    assert(dimRows == 1536L,
      s"expected 1536 per-dim rows, got $dimRows — the shape writer " +
        "stopped widening and this test is vacuous")
  }

  test("sweep crash classifier: overflow raises are domain refusals; suppressed crashes are not") {
    // overflowDomainRefusal: the finite-overflow contract classes pass...
    val cast = new ArithmeticException(
      "[CAST_OVERFLOW] The value 9.9E20D of the type \"DOUBLE\" cannot be cast to \"BIGINT\"")
    val mul = new ArithmeticException("[ARITHMETIC_OVERFLOW] long overflow.")
    assert(EmptySweep.overflowDomainRefusal(cast))
    assert(EmptySweep.overflowDomainRefusal(mul))
    // ...but an engine dividing by its own derived zero stays a crash
    // (the q192 class)
    val div = new ArithmeticException("[DIVIDE_BY_ZERO] Division by zero.")
    assert(!EmptySweep.overflowDomainRefusal(div) &&
      !EmptySweep.nanDomainRefusal(div))
    assert(EmptySweep.crashIn(div).isDefined)
    // crashIn walks SUPPRESSED chains (AQE multi-failure wrappers attach
    // concurrent stage failures as suppressed, not causes): an NPE hidden
    // there is a crash, a suppressed overflow is not
    val wrapNpe = new RuntimeException("stage materialization failures")
    wrapNpe.addSuppressed(new NullPointerException("hidden"))
    assert(EmptySweep.crashIn(wrapNpe).isDefined)
    val wrapOvf = new RuntimeException("stage materialization failures")
    wrapOvf.addSuppressed(cast)
    assert(EmptySweep.crashIn(wrapOvf).isEmpty)
  }

  test("all gates survive hostile unicode (astral/combining/RTL/NUL/ZWJ); text gates flow") {
    // short repeat keeps texts inside editDistancePairs' maxTextLen
    // domain; the 100k-char shape stays tool-only (suite time + the
    // length guard's refusal is its own spec'd contract in CorpusSpec)
    val results = sweepDir(
      EmptySweep.writeUnicodeTables(spark, "/root/testdata/sf0.001", _,
        longRepeat = 40),
      "graft_unicode_spec")
    val crashes = results.collect { case (n, Some(c), _) =>
      s"$n crashed: ${c.getClass.getName}: ${c.getMessage}" }
    assert(crashes.isEmpty, crashes.mkString("\n"))
    // the text-analysis surface must PROCESS hostile text, not refuse it:
    // census, language-id, quality, fingerprint, and the tokenizing dedup
    val mustFlow = Seq("q20_text_stats", "q21_token_classes", "q22_lang_id",
      "q23_quality_score", "q24_doc_fingerprint", "q25_exact_dedup")
    val present = results.filter(r => mustFlow.exists(r._1.startsWith))
    assert(present.nonEmpty, s"none of $mustFlow found in the gate board")
    val refused = present.collect { case (n, _, Some(e)) =>
      s"$n refused on hostile text: ${e.getMessage}" }
    assert(refused.isEmpty, refused.mkString("\n"))
  }
}
