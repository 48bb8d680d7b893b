package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{Exact, Hashing, TextAnalysis}

/** Corpus-curation operators a large-scale training-data pipeline needs on
  * top of dedup: benchmark decontamination, duplicated-span detection,
  * token-budget selection, domain-mixture weights, per-domain quality
  * banding, and sliding-window chunking.
  *
  * All of these are pure DataFrame plans over `documents`-shaped input —
  * Catalyst sees the whole tree, so pushdown/pruning/AQE apply. Every
  * pairwise or corpus-wide step is keyed (n-gram hash, group, range) so the
  * work distributes; there is no all-pairs or driver-side loop anywhere.
  */
object Curation {

  /** Benchmark decontamination: flag training docs sharing at least one
    * word `n`-gram with any document of the (small) benchmark/eval set —
    * the n-gram-overlap rule used by public LLM training pipelines to
    * scrub eval leakage.
    *
    * Input: `isBench` marks benchmark members. Output: one row per
    * CONTAMINATED training doc — (id, n_shared) where n_shared counts the
    * distinct shared n-grams.
    *
    * Scale shape: the benchmark n-gram set is small by construction (eval
    * suites are thousands of docs, not billions), so it broadcasts and the
    * training side is a map-side hash join on the exploded n-grams — one
    * shuffle total (the per-doc count). If the "benchmark" outgrows
    * broadcast, pass `benchBroadcastable = false`: the exploded training
    * grams are bloom-prefiltered at the scan ([[BloomJoin.semiJoin]] —
    * the overwhelming non-shared majority never reaches an exchange) and
    * the residual is a shuffle equi-join. Both paths return identical
    * rows (bench grams are distinct, so inner join ≡ semi-join here).
    *
    * `shingles` should be the native [[graft.functions.WordShinglesExpr]]
    * kernel (one pass per row); the composed
    * `TextAnalysis.wordShingles(tokens(text), n)` form re-tokenizes the
    * document once PER GRAM under interpreted higher-order eval (the q37
    * no-CSE lesson — measured 10× slower on this op).
    */
  def decontaminate(docs: DataFrame, idCol: String, shingles: Column,
      isBench: Column, benchBroadcastable: Boolean = true): DataFrame = {
    val base = docs.select(col(idCol), isBench.as("_bench"),
      shingles.as("_sh"))
    // hash the grams: joins/aggregates move 8-byte longs, not strings
    val bench = base.filter(col("_bench"))
      .select(explode(col("_sh")).as("_g"))
      .select(Hashing.hash60(col("_g"), "decon").as("g"))
      .distinct()
    val trainGrams = base.filter(!col("_bench"))
      .select(col(idCol), explode(col("_sh")).as("_g"))
      .select(col(idCol), Hashing.hash60(col("_g"), "decon").as("g"))
    val shared =
      if (benchBroadcastable) trainGrams.join(broadcast(bench), "g")
      else BloomJoin.semiJoin(trainGrams, col("g"), bench, col("g"))
    // wordShingles is distinct per doc, so count(*) = distinct shared grams
    shared.groupBy(idCol).agg(count(lit(1)).as("n_shared"))
  }

  /** Blocklist filtering (the C4 "badwords" rule): per-doc count of tokens
    * appearing in a fixed lexicon, plus the flag. The lexicon rides as a
    * literal inside one codegen'd per-row expression — right for the
    * curated lists public pipelines actually use (hundreds to a few
    * thousand terms). A lexicon too large for a literal becomes the
    * [[decontaminate]] shape instead: explode tokens, semi-join the
    * lexicon (broadcast or [[BloomJoin]]), count per doc.
    */
  def blocklistFilter(docs: DataFrame, idCol: String, toks: Column,
      lexicon: Seq[String]): DataFrame = {
    require(lexicon.nonEmpty, "empty blocklist")
    docs
      .withColumn("n_hits",
        graft.functions.TextAnalysis.lexiconHits(toks, lexicon).cast("long"))
      .withColumn("flagged", col("n_hits") > 0)
  }

  /** Duplicated-span detection (the distributable approximation of
    * suffix-array substring dedup): an `n`-token span is "duplicated" when
    * it occurs in more than one document. Per doc: total spans, duplicated
    * spans, duplicated fraction.
    *
    * Scale shape: spans are 60-bit hashes; one groupBy(g) with map-side
    * combine builds the span→doc-count table, then the join back is on the
    * same key — the exploded span table is persisted and both sides arrive
    * hash-partitioned on `g`, so AQE reuses the exchange. Cost is
    * O(total tokens), never quadratic.
    */
  def duplicateSpans(docs: DataFrame, idCol: String,
      shingles: Column): DataFrame = {
    val spans = docs
      .select(col(idCol), explode(shingles).as("_g"))
      .select(col(idCol), Hashing.hash60(col("_g"), "span").as("g"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val docFreq = spans.groupBy("g").agg(count(lit(1)).as("ndocs"))
    // spans are distinct within a doc, so count(*) per g = #docs containing it
    Pins.sealOutput(
      spans.join(docFreq, "g")
        .groupBy(idCol)
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_dup"))
        .withColumn("dup_frac",
          Exact.roundPortable(col("n_dup").cast("double") / col("n_spans"), 6)),
      spans)
  }

  /** Greedy token-budget selection: order docs by (score desc, id) and
    * select while the running token total stays under `budget` — the
    * "take the best B tokens" step of corpus curation.
    *
    * A global ordered running sum is exactly what `Window.orderBy` without
    * a partition key CANNOT do at scale (single reducer); this rides the
    * two-pass distributed [[PrefixSum]] instead: range-partition by the
    * (total) order key, per-partition partials, O(partitions) driver
    * state. Output: (id, score, tokens, cum_before, selected).
    */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, score: Column,
      tokens: Column, budget: Long): DataFrame = {
    val base = docs.select(col(idCol), score.as("score"),
        tokens.cast("long").as("tokens"))
      // struct ordering is field-wise, so this single column is the total
      // order (score desc via negation, id tiebreak) PrefixSum requires
      .withColumn("_ord",
        struct((lit(0.0) - col("score")).as("s"), col(idCol).as("i")))
    PrefixSum.exclusive(base, "_ord", "tokens", "cum_before")
      .withColumn("selected", col("cum_before") < lit(budget))
      .drop("_ord")
  }

  /** Temperature-scaled domain-mixture weights: per group, token share
    * p_g = toks_g / total and sampling weight w_g ∝ sqrt(p_g) (the
    * alpha = 0.5 temperature used to up-weight small domains), normalized
    * to sum to 1.
    *
    * Exactness: shares are IEEE divisions (bit-identical everywhere);
    * sqrt is the one correctly-rounded transcendental, so it is portable
    * too; the normalization sums MICRO-scaled longs, not doubles, so the
    * result is independent of aggregation order. One partial+final
    * aggregate over the corpus; the per-group table is tiny and the window
    * over it is a single light stage.
    */
  def domainMixture(docs: DataFrame, groupCol: String,
      tokens: Column): DataFrame = {
    val per = docs.groupBy(groupCol).agg(sum(tokens.cast("long")).as("toks"))
    val w = Window.partitionBy()
    per
      .withColumn("_total", sum("toks").over(w))
      // a corpus whose every group has 0 tokens has no mixture: NULL
      // share/weight (the undefined-statistic currency) instead of an
      // ANSI divide-by-zero raise (round-13 division audit). When ANY
      // group has tokens, _total > 0 and sum(_wm) ≥ the largest group's
      // _wm ≥ ⌊√(1/#groups)·10⁶⌉ > 0, so the guarded branches are the
      // only reachable zero-divisor shapes.
      .withColumn("share", when(col("_total") > 0,
        col("toks").cast("double") / col("_total")))
      .withColumn("_wm",
        floor(sqrt(col("share")) * 1000000 + 0.5).cast("long"))
      .withColumn("weight",
        when(sum("_wm").over(w) > 0, Exact.roundPortable(
          col("_wm").cast("double") / sum("_wm").over(w).cast("double"), 6)))
      .select(col(groupCol), col("toks"),
        Exact.roundPortable(col("share"), 6).as("share"), col("weight"))
  }

  /** Materialize a [[domainMixture]]: deterministic per-domain sampling.
    * Rates are the mixture weights scaled so the most up-weighted domain
    * keeps everything (rate 1.0); a doc survives iff
    * hashUnit(id, seed) < rate(group) — reproducible on any topology, and
    * an engine-portable decision (the hash and both divisions are exact).
    *
    * One corpus aggregate for the weights (tiny result), then a broadcast
    * join of the rate table onto the corpus and a stateless filter — the
    * corpus itself never shuffles.
    */
  def mixtureSample(docs: DataFrame, idCol: String, groupCol: String,
      tokens: Column, seed: String): DataFrame = {
    val rates = domainMixture(docs.select(col(groupCol), tokens.as("_tk")),
        groupCol, col("_tk"))
      // NULL weights (no-token corpus, see domainMixture) → NULL rate →
      // the hash filter below keeps nothing: undefined mixture samples
      // empty rather than raising (round-13 division audit)
      .withColumn("rate", when(max("weight").over(Window.partitionBy()) > 0,
        col("weight") / max("weight").over(Window.partitionBy())))
      .select(col(groupCol), col("rate"))
    docs.select(col(idCol), col(groupCol))
      .join(broadcast(rates), groupCol)
      .filter(Hashing.hashUnit(col(idCol).cast("string"), seed) < col("rate"))
      .select(col(idCol), col(groupCol), Exact.roundPortable(col("rate"), 6).as("rate"))
  }

  /** Per-group IQR outlier flagging on a numeric column: type-7 linearly
    * interpolated p25/p75 within each group ([[Quantiles.perGroup]],
    * unrounded — the fences round once at the end), Tukey fences at
    * 1.5·IQR, every row flagged. The quantile rank pass is one keyed sort
    * partitioned by group; the fence table is group-sized and joins back
    * by group key.
    */
  def iqrOutliers(docs: DataFrame, idCol: String, groupCol: String,
      value: Column): DataFrame = {
    val base = docs.select(col(idCol), col(groupCol), value.cast("double").as("v"))
    val fences = Quantiles.perGroup(base.select(col(groupCol), col("v")),
        groupCol, "v", Seq("_q25" -> 0.25, "_q75" -> 0.75), roundDp = None)
      .withColumn("lo", col("_q25") - (col("_q75") - col("_q25")) * 1.5)
      .withColumn("hi", col("_q75") + (col("_q75") - col("_q25")) * 1.5)
      .select(col(groupCol), col("lo"), col("hi"))
    base.join(fences, groupCol)
      .withColumn("is_outlier", col("v") < col("lo") || col("v") > col("hi"))
      .select(col(idCol), col(groupCol), col("v"),
        Exact.roundPortable(col("lo"), 6).as("lo"),
        Exact.roundPortable(col("hi"), 6).as("hi"), col("is_outlier"))
  }

  /** Per-group winsorization: clamp a numeric column to its group's
    * [pLo, pHi] exact type-7 quantiles — the outlier treatment that keeps
    * the row (vs [[iqrOutliers]], which flags it). Returns every row with
    * the group fences and the clipped value. Same scale shape as the IQR
    * fences: one keyed rank window ([[Quantiles.perGroup]], unrounded —
    * the outputs round once at the end) + a group-sized fence join.
    */
  def winsorize(docs: DataFrame, idCol: String, groupCol: String,
      value: Column, pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got pLo=$pLo pHi=$pHi")
    val base = docs.select(col(idCol), col(groupCol), value.cast("double").as("v"))
    val fences = Quantiles.perGroup(base.select(col(groupCol), col("v")),
        groupCol, "v", Seq("_lo" -> pLo, "_hi" -> pHi), roundDp = None)
      .select(col(groupCol), col("_lo"), col("_hi"))
    base.join(fences, groupCol)
      .select(col(idCol), col(groupCol), col("v"),
        Exact.roundPortable(col("_lo"), 6).as("lo"),
        Exact.roundPortable(col("_hi"), 6).as("hi"),
        Exact.roundPortable(
          least(greatest(col("v"), col("_lo")), col("_hi")), 6).as("clipped"))
  }

  /** Split-contamination audit: near-duplicate pairs (MinHash-LSH
    * candidates, verified Jaccard ≥ `thr`) whose members land in
    * DIFFERENT hash-assigned splits — exactly the train→test leakage an
    * evaluation must not have. Composes the deterministic split (F6) with
    * the LSH dedup path; output is the leaking pair list with both split
    * labels and the verified similarity.
    *
    * Scale shape: inherits the banded equi-join from
    * [[Dedup.minhashLshPairs]]; the split labels are a per-row hash
    * expression joined back by id onto the (small) pair list.
    */
  def splitLeakage(docs: DataFrame, idCol: String, shingles: Column,
      splitSeed: String, train: Double, validation: Double,
      bands: Int, rowsPerBand: Int, lshSeed: String, thr: Double): DataFrame = {
    require(train >= 0 && validation >= 0 && train + validation <= 1,
      s"need train, validation >= 0 and train + validation <= 1, got $train/$validation")
    val pairs = Dedup.minhashLshPairs(docs.withColumn("_sh", shingles),
      idCol, "_sh", bands, rowsPerBand, lshSeed, thr, portable = true)
    val splits = docs.select(col(idCol),
      Hashing.splitAssign(col(idCol).cast("string"), splitSeed,
        train, validation).as("split"))
    pairs
      .join(splits.select(col(idCol).as("id_a"), col("split").as("split_a")), "id_a")
      .join(splits.select(col(idCol).as("id_b"), col("split").as("split_b")), "id_b")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("id_a"), col("id_b"), col("split_a"), col("split_b"), col("jac"))
  }

  /** Quality-aware canonical selection: keep the best-`score` member of
    * each duplicate cluster ((score desc, id) total order — deterministic
    * under ties). The upgrade over keep-min-id canonicals: dedup should
    * retain the BEST copy, not the earliest. One window over the
    * cluster-labeled table, partitioned by cluster id.
    */
  def keepBestPerCluster(labeled: DataFrame, clusterCol: String,
      idCol: String, score: Column): DataFrame =
    labeled
      .withColumn("_rn", row_number().over(
        Window.partitionBy(clusterCol).orderBy(score.desc, col(idCol))))
      .withColumn("keep", col("_rn") === 1)
      .drop("_rn")

  /** Per-group quality banding: percent_rank of `score` within each group
    * plus the derived decile band — the "top X% per domain" filter.
    *
    * percent_rank depends only on the rank of the ordering key, so ties on
    * `score` are deterministic without a tiebreak. The window partitions
    * by group: with many groups this scales as an ordinary keyed sort;
    * with FEW huge groups, compute per-group decile boundaries with
    * [[Quantiles]] and assign by broadcast range lookup instead — same
    * output, no giant partition.
    */
  def qualityBands(docs: DataFrame, idCol: String, groupCol: String,
      score: Column): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy("score")
    docs.select(col(idCol), col(groupCol), score.as("score"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("band", least(floor(col("pr") * 10), lit(9L)).cast("long"))
      .withColumn("pr", Exact.roundPortable(col("pr"), 6))
  }

  /** Per-source data-card profile: doc/token counts, mean tokens, distinct
    * and modal language (deterministic (count desc, lang) tiebreak), mean
    * quality — the summary table a corpus release ships with.
    *
    * Two keyed aggregates (source; source×lang) + a group-sized join.
    * Mean quality sums MICRO-scaled longs so the result is independent of
    * aggregation order.
    */
  def sourceProfile(docs: DataFrame, groupCol: String, langCol: String,
      tokens: Column, quality: Column): DataFrame = {
    val base = docs.select(col(groupCol), col(langCol),
      tokens.cast("long").as("_tk"),
      floor(quality * 1000000 + 0.5).cast("long").as("_qm"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val per = base.groupBy(groupCol).agg(
      count(lit(1)).as("n_docs"), sum("_tk").as("n_tokens"),
      count_distinct(col(langCol)).as("n_langs"), sum("_qm").as("_qs"))
    val topLang = base.groupBy(col(groupCol), col(langCol))
      .agg(count(lit(1)).as("_lc"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(groupCol).orderBy(col("_lc").desc, col(langCol))))
      .filter(col("_rn") === 1)
      .select(col(groupCol), col(langCol).as("top_lang"))
    Pins.sealOutput(
      per.join(topLang, groupCol)
        .select(col(groupCol), col("n_docs"), col("n_tokens"),
          Exact.roundPortable(
            col("n_tokens").cast("double") / col("n_docs").cast("double"), 6)
            .as("mean_tokens"),
          col("n_langs"), col("top_lang"),
          Exact.roundPortable(
            col("_qs").cast("double") / 1000000.0 / col("n_docs").cast("double"), 6)
            .as("mean_quality")),
      base)
  }

  /** End-to-end curation: normalize → exact-dedup on the normalized text
    * (keep smallest id) → quality floor → greedy token-budget selection.
    * The standard "raw crawl in, training corpus out" composition, wired
    * from the individual operators so every stage keeps its own scale
    * shape (per-row normalize, one dedup shuffle, stateless filter,
    * distributed prefix sum).
    *
    * Output: (id, score, tokens, cum_before, selected) for every doc that
    * survives dedup + the quality floor.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      quality: Column, tokens: Column, minQuality: Double,
      budget: Long): DataFrame = {
    // dedup on a SLIM (id, fingerprint) frame — the keeper window then
    // shuffles 40 bytes/row instead of dragging the document text through
    // the exchange; keepers rejoin by id (the quality filter pushes to the
    // doc side of this join, so losers are scored once and pruned early)
    val slim = docs.select(col(idCol),
      md5(TextAnalysis.normalizeText(col(textCol))).as("_fp"))
    val keepers = slim
      .withColumn("_min",
        min(col(idCol)).over(Window.partitionBy("_fp")))
      .filter(col(idCol) === col("_min"))
      .select(col(idCol))
    val scored = docs
      .select(col(idCol), quality.as("score"), tokens.cast("long").as("tokens"))
      .filter(col("score") >= minQuality)
      .join(keepers, idCol)
    tokenBudgetSelect(scored, idCol, col("score"), col("tokens"), budget)
  }

  /** Cap any one source's share of the corpus: keep each group's
    * best-first prefix (weight desc, id tiebreak) while the group's
    * cumulative weight stays within `capPermille`/1000 of the GLOBAL
    * total — the source-balancing rule that stops one crawl dump from
    * dominating a training mix. Output: every row with its in-group
    * cumulative weight `cum_w` and the survivor flag `kept`.
    *
    * Exactness: weights are longs and the cap is integer arithmetic
    * (`total * capPermille DIV 1000`), so the kept set is identical on
    * any engine/topology. Scale shape: one partial+final aggregate for
    * the 1-row total (broadcast back via cross join), one per-GROUP
    * cumulative window — partitioned by source, so it distributes;
    * nothing orders the full corpus globally.
    */
  def capSourceShare(docs: DataFrame, idCol: String, groupCol: String,
      weight: Column, capPermille: Int): DataFrame = {
    require(capPermille > 0 && capPermille <= 1000,
      s"capPermille must be in (0, 1000], got $capPermille")
    val base = docs.select(col(idCol), col(groupCol), weight.cast("long").as("w"))
    val total = base.agg(sum("w").as("_total"))
    val win = Window.partitionBy(groupCol).orderBy(col("w").desc, col(idCol))
    base.crossJoin(broadcast(total))
      .withColumn("cum_w", sum("w").over(win))
      .withColumn("kept", col("cum_w") <= expr(s"_total * $capPermille DIV 1000"))
      .drop("_total")
  }

  /** Length-bucket packing audit: assign each doc to the fixed batch
    * length that would hold it (`ceil(n_tok / bucket) * bucket`) and
    * report per-bucket doc count, token total, and the padding the
    * bucket wastes — the signal behind length-grouped batching (pad to
    * the bucket, not the global max). Zero-token docs land in bucket 0
    * with zero padding. One groupBy shuffle on the bucket key.
    */
  def lengthBuckets(docs: DataFrame, tokens: Column, bucket: Int): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    docs.select(tokens.cast("long").as("_n"))
      .withColumn("bucket_len", expr(s"(_n + ${bucket - 1}) DIV $bucket") * bucket)
      .groupBy("bucket_len")
      .agg(count(lit(1)).as("n_docs"), sum("_n").as("sum_tok"))
      .withColumn("padding", col("bucket_len") * col("n_docs") - col("sum_tok"))
      .withColumn("pad_frac",
        when(col("bucket_len") === 0, lit(0.0)).otherwise(
          Exact.roundPortable(
            col("padding").cast("double") / (col("bucket_len") * col("n_docs")).cast("double"),
            6)))
  }

  /** Sliding-window chunking: split each doc's token stream into windows
    * of `maxLen` tokens advancing by `stride` (overlap = maxLen - stride),
    * the standard pre-tokenization step for fixed-context training.
    * Output: (id, chunk_idx, n_toks, fp) with fp = md5 of the
    * space-joined window (portable across engines).
    *
    * Per-row generate+posexplode — embarrassingly parallel, no shuffle;
    * output size is ~len/stride rows per doc, linear in the corpus.
    */
  /** Materialize fractional epoch weights as actual row repetition: each
    * row appears `floor(epochs)` times, plus one more with probability
    * `frac(epochs)` — decided by the row's seeded unit hash, so the
    * realized corpus is deterministic in the key and E[copies] = epochs
    * exactly. This is the APPLY step for [[Sampling.unimaxAlloc]] /
    * [[domainMixture]] weights: upstream computes per-group epochs,
    * this turns them into the epoch-expanded training view.
    *
    * Scale shape: pure map-side `explode(sequence(...))` — no shuffle,
    * no state; rows with realized 0 copies are dropped before the
    * explode. Output keeps every input column plus `copy` (1-based).
    */
  def epochUpsample(docs: DataFrame, idCol: String, epochs: Column,
      seed: String, maxCopies: Long = 10000L): DataFrame = {
    require(maxCopies > 0, s"maxCopies must be > 0, got $maxCopies")
    val frac = epochs - floor(epochs)
    val nc = floor(epochs).cast("long") +
      when(Hashing.hashUnit(col(idCol).cast("string"), seed) < frac, 1L)
        .otherwise(0L)
    docs.withColumn("_nc", nc)
      .filter(col("_nc") > 0)
      // amplification cap (round-13, the RangeJoin pattern): a corrupt
      // epochs value (1e9 from a bad join) silently explodes one row into
      // a cluster-killer; real mixtures use single-digit epochs
      .withColumn("copy", explode(when(col("_nc") <= maxCopies,
        sequence(lit(1L), col("_nc")))
        .otherwise(raise_error(format_string(
          "graft.Curation.epochUpsample: row requests %s copies " +
            s"(cap $maxCopies) — a corrupt epochs value would explode " +
            "the corpus; fix upstream or raise maxCopies",
          col("_nc"))))))
      .drop("_nc")
  }

  def slidingChunks(docs: DataFrame, idCol: String, toks: Column,
      maxLen: Int, stride: Int): DataFrame = {
    require(stride > 0 && maxLen >= stride,
      s"need 0 < stride <= maxLen, got stride=$stride maxLen=$maxLen")
    // materialize the token array FIRST: `size(toks)` appears three times
    // in the chunk-count expression, and tokenization is interpreted
    // (higher-order filter) so Catalyst cannot CSE it — referencing the
    // materialized attribute keeps it one evaluation per row
    val withToks = docs.select(col(idCol), toks.as("_toks"))
    val len = size(col("_toks"))
    val nChunks = when(len <= 0, lit(0L)).otherwise(
      when(len <= maxLen, lit(1L)).otherwise(
        floor((len - maxLen + stride - 1).cast("double") / stride).cast("long") + 1))
    withToks
      .select(col(idCol), col("_toks"), nChunks.as("_nc"))
      .filter(col("_nc") > 0)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0L), col("_nc") - 1),
          i => slice(col("_toks"), (i * stride + 1).cast("int"), lit(maxLen)))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        size(col("col")).cast("long").as("n_toks"),
        md5(concat_ws(" ", col("col"))).as("fp"))
  }
}
