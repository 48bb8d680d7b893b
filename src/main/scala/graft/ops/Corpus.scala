package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Corpus-level text operators for training-data curation: inverted index
  * construction, PMI collocation mining, and per-source distribution drift.
  *
  * Scale design (100 TB):
  *  - every operator shuffles the corpus AT MOST ONCE, on the token — all
  *    downstream joins/aggregations run on vocabulary-sized tables (the
  *    distinct-token count, orders of magnitude below the corpus size) and
  *    broadcast;
  *  - drift and PMI scores are computed from EXACT integer counts with a
  *    single final IEEE division, so results are bit-identical under any
  *    partial-aggregation tree or cluster size (see graft.functions.Exact);
  *  - no log-space math in comparable outputs: libm `ln` differs across
  *    engines in the last ulp, which breaks oracle hash-matching. Ranking
  *    uses the exact likelihood RATIO instead (PMI is its monotone log).
  */
object Corpus {

  /** Token → (document frequency, sorted posting list). One explode of the
    * per-document DISTINCT token set — the shuffle carries each (doc, term)
    * pair once, not one record per occurrence — then one groupBy(term).
    *
    * At 100 TB posting lists for stopword-class terms exceed single-row
    * limits — production would shard postings per (term, doc_id range);
    * `maxPostings` caps the materialized list here (df stays exact) so no
    * row is unbounded.
    *
    * The cap is applied BEFORE collection, not by slicing afterwards
    * (round-14 collect-then-slice audit): `slice(collect_list(...))`
    * still materialized the FULL posting list in the aggregation buffer
    * — and agg buffers, unlike window operators, cannot spill, so one
    * stopword term at corpus scale was an executor OOM with a capped
    * OUTPUT. The rank window shuffles on the same key as the groupBy
    * (one exchange, rows spill-sorted), and the NULL-skipping
    * collect_list(when(rk ≤ cap)) bounds the buffer at `maxPostings`
    * while count(*) keeps df exact over all rows.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 1L, maxPostings: Int = 10000): DataFrame = {
    // NULLS LAST (round-14 advice): ascending NULLS FIRST would hand NULL
    // doc_ids the first rank slots, and collect_list then SKIPS them — a
    // term at the cap would silently lose up to #null real postings vs
    // the pre-r14 slice(sort_array(...)) output. Ranking nulls last keeps
    // the capped prefix all-real while `df` still counts every row.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy(col("doc_id").asc_nulls_last)
    docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("term"))
      .withColumn("_rk", row_number().over(w))
      .groupBy("term")
      .agg(
        count(lit(1)).as("df"),
        sort_array(collect_list(
          when(col("_rk") <= maxPostings, col("doc_id")))).as("postings"))
      .where(col("df") >= minDf)
  }

  /** Tokenizer-vocabulary coverage: build the top-`vocabSize` vocabulary
    * by corpus frequency (count desc, token asc — a total order, so the
    * cutoff is deterministic) and report each document's out-of-vocabulary
    * token count and rate. The signal behind vocab sizing and
    * tokenizer-coverage audits; docs with zero tokens are excluded (no
    * rate is defined for them).
    *
    * Scale shape: one (doc, token) explode feeds BOTH the frequency table
    * and the per-doc rejoin (persisted — two consumers); the vocabulary is
    * a top-k over the token-count table (vocabulary-sized, not
    * corpus-sized) and broadcasts to the rejoin, so the corpus shuffles
    * once for the counts and once for the per-doc aggregate.
    */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = tok.groupBy("term").agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col("term"))
      .limit(vocabSize)
      .select(col("term"), lit(true).as("_inv"))
    Pins.sealOutput(
      tok.join(broadcast(vocab), Seq("term"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          sum(when(col("_inv").isNull, 1L).otherwise(0L)).as("oov"))
        .withColumn("oov_rate",
          graft.functions.Exact.roundPortable(
            col("oov").cast("double") / col("n_tok").cast("double"), 6)),
      tok)
  }

  /** Top collocations (adjacent word pairs) by pointwise mutual information,
    * ranked via the exact likelihood ratio
    * `r = (c_xy / M) / ((c_x / N) · (c_y / N)) = c_xy·N² / (M·c_x·c_y)`
    * (PMI = ln r; same ordering, no libm). Numerator and denominator are
    * exact Longs below 2⁵³, so the one double division is bit-portable.
    *
    * Plan: one corpus pass for bigram counts, one for unigram counts (both
    * single-shuffle), then vocabulary-sized broadcast joins and a top-k.
    * Long-range guard: c_xy·N² needs log-space ranking past N ≈ 2M tokens
    * per Long budget — at that scale rank by `ln` (ordering only needs
    * engine-internal consistency, not cross-engine bit equality).
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Long = 5L, topK: Int = 20): DataFrame = {
    val toks = docs.select(TextAnalysis.tokens(col(textCol)).as("toks"))
    // both count tables are vocabulary-sized and each feeds TWO consumers
    // (the join and its own total) — persist so the corpus explode+shuffle
    // runs once per table, not once per consumer
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bi = toks.select(explode(TextAnalysis.bigrams(col("toks"))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_xy"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = uni.agg(sum("c_w").as("n_uni")).crossJoin(
      bi.agg(sum("c_xy").as("m_bi")))

    Pins.sealOutput(
      bi.where(col("c_xy") >= minCount)
        .withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
        .join(broadcast(uni.select(col("w").as("w1"), col("c_w").as("c_x"))), "w1")
        .join(broadcast(uni.select(col("w").as("w2"), col("c_w").as("c_y"))), "w2")
        .crossJoin(broadcast(totals))
        .withColumn("score",
          (col("c_xy") * col("n_uni") * col("n_uni")).cast("double") /
            (col("m_bi") * col("c_x") * col("c_y")).cast("double"))
        .orderBy(col("score").desc, col("bigram"))
        .limit(topK)
        .select("bigram", "c_xy", "c_x", "c_y", "score"),
      uni, bi)
  }

  /** Per-group total variation distance between the group's unigram
    * distribution and the corpus distribution:
    * `TVD_g = ½ Σ_t |c_tg/N_g − c_t/N| = numer_g / (2·N_g·N)` with
    * `numer_g = Σ_{t∈g} |c_tg·N − c_t·N_g| + (N − S_g)·N_g` where
    * `S_g = Σ_{t∈g} c_t` folds in every token ABSENT from the group
    * without materializing the group×vocab cross product. The numerator is
    * exact integer arithmetic — order-independent and engine-portable —
    * with one final double division.
    *
    * One corpus shuffle on (group, token); corpus marginals are derived by
    * re-aggregating that (|groups|·|vocab|)-sized table, never rescanning
    * the corpus. The per-token join broadcasts the vocabulary.
    */
  def groupDriftTvd(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    // (|groups|·|vocab|)-sized and feeds FOUR consumers (itself + three
    // marginals): persist, or every marginal re-shuffles the whole corpus
    val gt = docs
      .select(col(groupCol).as("grp"), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy("grp", "tok").agg(count(lit(1)).as("c_tg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tokTotals = gt.groupBy("tok").agg(sum("c_tg").as("c_t"))
    val grpTotals = gt.groupBy("grp").agg(sum("c_tg").as("n_g"))
    val nTotal = tokTotals.agg(sum("c_t").as("n"))

    Pins.sealOutput(
      gt.join(broadcast(tokTotals), "tok")
        .join(broadcast(grpTotals), "grp")
        .crossJoin(broadcast(nTotal))
        .groupBy("grp")
        .agg(
          first(col("n_g")).as("n_g"),
          first(col("n")).as("n"),
          sum(abs(col("c_tg") * col("n") - col("c_t") * col("n_g"))).as("present_abs"),
          sum(col("c_t")).as("s_g"))
        .withColumn("numer", col("present_abs") + (col("n") - col("s_g")) * col("n_g"))
        .withColumn("tvd", col("numer").cast("double") / (lit(2L) * col("n_g") * col("n")).cast("double"))
        .select(col("grp"), col("n_g").as("group_tokens"), col("tvd")),
      gt)
  }

  /** Jensen-Shannon divergence of each group's unigram distribution from
    * the corpus distribution — the bounded (≤ ln 2), symmetric drift
    * signal next to [[groupDriftTvd]]'s TVD. Same one-corpus-shuffle
    * shape; two portability moves make the log arithmetic replayable:
    *  - per-(group, token) contributions 0.5·p·ln(p/m) + 0.5·q·ln(q/m)
    *    are QUANTIZED to 1e-12-scaled Longs before summing (the q88
    *    discipline: float sums are partial-agg-order-nondeterministic,
    *    integer sums are not);
    *  - tokens ABSENT from the group (p = 0) contribute analytically:
    *    their mass is 0.5·q·ln 2 each, so the whole tail collapses to
    *    0.5·(1 − Σ_present q)·ln 2 — one exact integer numerator sum and
    *    one closed-form double, never a vocab×groups dense grid.
    */
  def jsDrift(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val gt = docs
      .select(col(groupCol).as("grp"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy("grp", "tok").agg(count(lit(1)).as("c_tg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tokTotals = gt.groupBy("tok").agg(sum("c_tg").as("c_t"))
    val grpTotals = gt.groupBy("grp").agg(sum("c_tg").as("n_g"))
    val nTotal = tokTotals.agg(sum("c_t").as("n"))
    val p = col("c_tg").cast("double") / col("n_g").cast("double")
    val q = col("c_t").cast("double") / col("n").cast("double")
    val m = (p + q) / 2.0
    val term = lit(0.5) * p * log(p / m) + lit(0.5) * q * log(q / m)
    Pins.sealOutput(
      gt.join(broadcast(tokTotals), "tok")
        .join(broadcast(grpTotals), "grp")
        .crossJoin(broadcast(nTotal))
        .groupBy("grp")
        .agg(
          first(col("n_g")).as("n_g"),
          first(col("n")).as("n"),
          sum(floor(term * 1e12 + 0.5).cast("long")).as("_t12"),
          sum(col("c_t")).as("_qnum"))
        .select(col("grp"), col("n_g").as("group_tokens"),
          graft.functions.Exact.roundPortable(
            col("_t12").cast("double") / 1e12 +
              (lit(0.5) * (lit(1.0) -
                col("_qnum").cast("double") / col("n").cast("double"))) *
                log(lit(2.0)), 6).as("js")),
      gt)
  }

  /** Vocabulary-growth (Heaps-law) curve: distinct-vocabulary size and
    * cumulative token count at `points` equal-spaced corpus prefixes in
    * `idCol` order. The signal behind tokenizer sizing and dedup-health
    * monitoring — a corpus whose vocabulary stops growing is repeating
    * itself.
    *
    * Scale shape: the naive form (one COUNT DISTINCT per checkpoint)
    * rescans the corpus `points` times. Instead: each term's FIRST-SEEN
    * doc id is one map-side-combined groupBy; bucketing first-seens (and
    * per-doc token counts) onto the checkpoint grid reduces everything to
    * two `points`-sized tables, and the curve is a cumulative sum over a
    * single-partition window of `points` rows. One corpus shuffle total,
    * whatever `points` is.
    */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
      points: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // PRECONDITION (asserted, one column-pruned aggregate): ids are dense
    // 0..n-1. The checkpoint grid and the closed-form prefix_docs count
    // both assume it — with sparse ids prefix_docs would silently inflate.
    // min/max/count alone admit duplicate+gap sets (e.g. {0, 0, 2} has
    // min=0, count=max+1) — exactly the inflation this check exists to
    // prevent — so distinctness is asserted too. An empty corpus has no
    // curve; fail loudly instead of NPE-ing on the null max.
    val bounds = docs.agg(min(col(idCol)).cast("long").as("mn"),
      max(col(idCol)).cast("long").as("mx"), count(lit(1)).as("cnt"),
      countDistinct(col(idCol)).as("dct")).head()
    require(!bounds.isNullAt(1),
      "vocabGrowth: empty corpus — no growth curve to compute")
    val n = bounds.getLong(1) + 1L
    require(bounds.getLong(0) == 0L && bounds.getLong(2) == n &&
        bounds.getLong(3) == n,
      s"vocabGrowth requires dense 0-based UNIQUE doc ids: got min=" +
        s"${bounds.getLong(0)}, max=${n - 1}, count=${bounds.getLong(2)}, " +
        s"distinct=${bounds.getLong(3)} (expected min=0, count=distinct=" +
        s"${n}); reindex ids first (W3 pattern)")
    // checkpoint i covers ids < t_i = floor(n·i/points); i = points is the
    // whole corpus. A term or doc at id d belongs to the FIRST checkpoint
    // with d < t_i, i.e. bucket(d) = floor(d·points/n) + 1 clamped high.
    // integer floor-div (non-negative operands): exact at any id scale
    def bucket(c: String): Column =
      expr(s"least(($c * ${points}L) DIV ${n}L + 1L, ${points}L)")
    val firstSeen = docs
      .select(col(idCol).cast("long").as("_d"),
        explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("_t"))
      .groupBy("_t").agg(min(col("_d")).as("_fs"))
      .groupBy(bucket("_fs").as("i"))
      .agg(count(lit(1)).as("_new_terms"))
    val tokCounts = docs
      .select(col(idCol).cast("long").as("_d"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("_nt"))
      .groupBy(bucket("_d").as("i"))
      .agg(sum(col("_nt")).as("_new_toks"))
    // points rows: the single-partition window is grid-sized, not
    // corpus-sized
    val w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    docs.sparkSession.range(1, points + 1).select(col("id").as("i"))
      .join(firstSeen, Seq("i"), "left")
      .join(tokCounts, Seq("i"), "left")
      .select(col("i"),
        // #(ids d with d·points < i·n) = ceil(i·n/points), in pure integer
        // arithmetic — identical on any engine, no FP division
        expr(s"(i * ${n}L + ${points - 1}L) DIV ${points}L").as("prefix_docs"),
        sum(coalesce(col("_new_toks"), lit(0L))).over(w).as("n_tokens"),
        sum(coalesce(col("_new_terms"), lit(0L))).over(w).as("vocab"))
  }
}
