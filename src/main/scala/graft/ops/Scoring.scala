package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.Exact

/** Corpus-statistics document scoring: BM25 ranked retrieval and a
  * unigram-LM log-probability quality filter (the "perplexity filter" of
  * public web-corpus pipelines, with the corpus itself as the LM).
  *
  * Portability pattern (shared with [[TfIdf]]): the only non-IEEE-exact
  * scalar op is ln/pow — it is applied to FEW distinct values (one per
  * term, not per occurrence) and immediately rounded to 6 decimals; all
  * per-occurrence combination then happens in micro-scaled LONGS, so sums
  * are associative-exact and independent of shuffle/aggregation order.
  */
object Scoring {

  /** Okapi BM25 scores for a fixed bag of query terms, top `k` docs by
    * (score desc, id).
    *
    *   idf(t)   = ln((N - df + 0.5)/(df + 0.5) + 1)      [rounded 6dp]
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * Scale shape: the explode is filtered to the query terms BEFORE the
    * aggregate, so the shuffled (doc, term) table is |terms|-bounded per
    * doc; df and the corpus constants (N, Σdl) are broadcast scalars; the
    * final top-k is TakeOrderedAndProject (per-partition heads, no global
    * sort).
    */
  def bm25(docs: DataFrame, idCol: String, toks: Column,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      k: Int = 50): DataFrame = {
    val base = docs.select(col(idCol), toks.as("_toks"))
      .withColumn("dl", size(col("_toks")).cast("long"))
    val stats = base.agg(count(lit(1)).as("_n"), sum("dl").as("_sumdl"))
    val tf = base
      .select(col(idCol), col("dl"), explode(col("_toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("_sumdl").cast("double") / col("_n").cast("double")
    val idf = Exact.roundPortable(
      log((col("_n").cast("double") - col("df").cast("double") + 0.5)
        / (col("df").cast("double") + 0.5) + 1.0), 6)
    // built to mirror the oracle SQL op-for-op: every step is an IEEE-exact
    // double op on both engines once idf is rounded
    val denom = col("tf").cast("double") +
      (lit(1.0) - b + (col("dl").cast("double") / avgdl) * b) * k1
    val partMicros = floor(
      idf * (col("tf").cast("double") * (k1 + 1.0)) / denom
        * 1000000.0 + 0.5).cast("long")
    Pins.sealOutput(
      tf.join(broadcast(dfT), "term")
        .crossJoin(broadcast(stats))
        .withColumn("_pm", partMicros)
        .groupBy(idCol)
        .agg(sum("_pm").as("_sm"))
        .select(col(idCol), Exact.fromMicros(col("_sm")).as("score"))
        .orderBy(col("score").desc, col(idCol))
        .limit(k),
      tf)
  }

  /** Per-doc mean unigram log-probability under the corpus's own unigram
    * distribution — low values mark gibberish/outlier docs (the cheap
    * stand-in for a perplexity filter when no external LM is available).
    *
    *   lp(t)  = ln(cnt(t) / total)                        [micros, rounded]
    *   doc d  → (n_toks, avg_lp = Σ lp(t_i) / 1e6 / n)
    *
    * Scale shape: one (term) aggregate with map-side combine builds the
    * LM; scoring joins the exploded corpus back on the SAME key, so the
    * persisted explode's exchange is reused; the per-doc aggregate sums
    * longs. Everything is O(total tokens) with two keyed shuffles.
    */
  def unigramLogProb(docs: DataFrame, idCol: String,
      toks: Column): DataFrame = {
    val tokens = docs.select(col(idCol), explode(toks).as("term"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val lm = tokens.groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = lm.agg(sum("cnt").as("_tot"))
    val lpMicros = floor(
      log(col("cnt").cast("double") / col("_tot").cast("double"))
        * 1000000 + 0.5).cast("long")
    val scoredTerms = lm.crossJoin(broadcast(total))
      .select(col("term"), lpMicros.as("_lp"))
    Pins.sealOutput(
      tokens.join(scoredTerms, "term")
        .groupBy(idCol)
        .agg(count(lit(1)).as("n_toks"), sum("_lp").as("_lps"))
        .select(col(idCol), col("n_toks"),
          Exact.roundPortable(
            col("_lps").cast("double") / 1000000.0 / col("n_toks").cast("double"),
            6).as("avg_lp")),
      tokens)
  }

  /** Stupid Backoff bigram scoring (Brants et al. EMNLP 2007 "Large
    * Language Models in Machine Translation"): per-doc mean log bigram
    * score under a count-only LM built from the `lmPred` slice —
    *
    *   S(w2|w1) = C(w1 w2) / C(w1)     seen bigram
    *            = α · C(w2) / N        unseen bigram, seen unigram
    *            = α / N                unseen unigram (count-1 leaf)
    *
    * — the non-normalized backoff that made web-scale distributed LMs
    * practical: counts only, no discounting pass. Training on a SLICE and
    * scoring everything is the production shape (LM from a trusted
    * corpus, scores over incoming data); it is also what makes the
    * backoff paths live. Docs with < 2 tokens have no bigram positions
    * and are excluded.
    *
    * Exactness: ln S is rounded to micros once per distinct BIGRAM TYPE;
    * per-doc combination is exact long sums. Scale shape: the (doc,
    * bigram) explode is persisted and feeds both the distinct-type score
    * table and the per-doc rejoin on the same key; LM count tables are
    * keyed equi-joins (bigram types ~ O(corpus tokens) — never collected);
    * N is a 1-row broadcast.
    */
  def stupidBackoff(docs: DataFrame, idCol: String, toks: Column,
      lmPred: Column, alpha: Double = 0.4): DataFrame = {
    val pairs = docs
      .select(col(idCol), lmPred.as("_lm"),
        explode(graft.functions.TextAnalysis.bigrams(toks)).as("bigram"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val lmPairs = pairs.filter(col("_lm"))
    val bc = lmPairs.groupBy("bigram").agg(count(lit(1)).as("c12"))
    // unigram counts over the SAME positions the bigrams cover would
    // double-count interior tokens; the LM unigram table counts every
    // token of the LM slice once
    val lmToks = docs.filter(lmPred)
      .select(explode(toks).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val uc = lmToks.groupBy("w").agg(count(lit(1)).as("cw"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = lmToks.agg(count(lit(1)).as("_n"))
    val types = pairs.select("bigram").distinct()
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(bc, Seq("bigram"), "left")
      .join(uc.select(col("w").as("w1"), col("cw").as("c1")), Seq("w1"), "left")
      .join(uc.select(col("w").as("w2"), col("cw").as("c2")), Seq("w2"), "left")
      .crossJoin(broadcast(n))
    val sMicros = when(col("c12").isNotNull,
        floor(log(col("c12").cast("double") / col("c1").cast("double"))
          * 1000000 + 0.5).cast("long"))
      .when(col("c2").isNotNull,
        floor(log(lit(alpha) * col("c2").cast("double") / col("_n").cast("double"))
          * 1000000 + 0.5).cast("long"))
      .otherwise(
        floor(log(lit(alpha) / col("_n").cast("double")) * 1000000 + 0.5).cast("long"))
    val scoreTable = types.select(col("bigram"), sMicros.as("_s"))
    Pins.sealOutput(
      pairs.join(scoreTable, "bigram")
        .groupBy(idCol)
        .agg(count(lit(1)).as("n_bigrams"), sum("_s").as("_ss"))
        .select(col(idCol), col("n_bigrams"),
          Exact.roundPortable(
            col("_ss").cast("double") / 1000000.0 / col("n_bigrams").cast("double"),
            6).as("sb_score")),
      pairs, lmToks, uc)
  }

  /** Moore-Lewis cross-entropy-difference data selection (ACL 2010
    * "Intelligent Selection of Language Model Training Data"): score each
    * doc by its mean per-token `lp_in(t) − lp_gen(t)`, the log-likelihood
    * ratio between an IN-DOMAIN unigram LM (docs where `inDomain` holds)
    * and the general corpus LM — positive means "looks more like the
    * target domain than like the average corpus". `selected` = score > 0.
    *
    * The in-domain LM is add-one smoothed over the GENERAL vocabulary
    * (`lp_in(t) = ln((cnt_in + 1) / (tot_in + V))`), so every corpus term
    * has a defined in-domain probability; the general LM needs no
    * smoothing (every scored token exists in it by construction). Both
    * per-term logs are rounded to micros once per TERM, then combined in
    * exact long sums (the [[TfIdf]]/[[bm25]] portability pattern).
    *
    * Scale shape: one persisted (doc, term) explode feeds the general
    * counts, the in-domain counts, and the scoring rejoin (same key ⇒
    * the exchange is reused); V and the two totals are 1-row broadcast
    * scalars; the per-doc aggregate sums longs.
    */
  def mooreLewis(docs: DataFrame, idCol: String, toks: Column,
      inDomain: Column): DataFrame = {
    val tokens = docs.select(col(idCol), inDomain.as("_ind"), explode(toks).as("term"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val gen = tokens.groupBy("term").agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ind = tokens.filter(col("_ind")).groupBy("term").agg(count(lit(1)).as("cnt_in"))
    val scalars = gen.agg(sum("cnt").as("_tot"), count(lit(1)).as("_v"))
      .crossJoin(tokens.filter(col("_ind")).agg(count(lit(1)).as("_tot_in")))
    val lpGen = floor(log(col("cnt").cast("double") / col("_tot").cast("double"))
      * 1000000 + 0.5).cast("long")
    val lpIn = floor(log((coalesce(col("cnt_in"), lit(0L)) + 1L).cast("double")
      / (col("_tot_in") + col("_v")).cast("double")) * 1000000 + 0.5).cast("long")
    val termScores = gen.join(ind, Seq("term"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("term"), (lpIn - lpGen).as("_d"))
    Pins.sealOutput(
      tokens.join(termScores, "term")
        .groupBy(idCol)
        .agg(count(lit(1)).as("n_toks"), sum("_d").as("_ds"))
        .select(col(idCol), col("n_toks"),
          Exact.roundPortable(
            col("_ds").cast("double") / 1000000.0 / col("n_toks").cast("double"),
            6).as("ml_score"))
        .withColumn("selected", col("ml_score") > 0.0),
      tokens, gen)
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., LREC 2020): score
    * every doc under a LANGUAGE-CONDITIONAL unigram LM (CCNet trains one
    * LM per language; here the corpus's own per-language distribution),
    * then split each language into head / middle / tail terciles by score
    * — the bucket label CCNet ships alongside each document so downstream
    * consumers can choose their quality/recall tradeoff.
    *
    * Bucketing is `ntile(3)` over (score desc, id) within the language —
    * "head" is the most-fluent tercile (highest mean log-prob = lowest
    * perplexity). Deterministic: scores are portably rounded before
    * ranking and ties break on id.
    *
    * Scale shape: per-language LM is one (lang, term) aggregate with
    * map-side combine; scoring rejoins the exploded corpus on the same
    * key; the tercile window sorts within each language partition — at
    * 100 TB replace ntile with two approxQuantile thresholds per language
    * (the labels are then a map-side comparison; the gate keeps exact
    * ntile so the oracle can mirror it).
    */
  def ccnetBuckets(docs: DataFrame, idCol: String, langCol: String,
      toks: Column): DataFrame = {
    val tokens = docs.select(col(idCol), col(langCol), explode(toks).as("term"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val lm = tokens.groupBy(langCol, "term").agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tot = lm.groupBy(langCol).agg(sum("cnt").as("_tot"))
    val lpMicros = floor(log(col("cnt").cast("double") / col("_tot").cast("double"))
      * 1000000 + 0.5).cast("long")
    val lp = lm.join(broadcast(tot), langCol).select(col(langCol), col("term"),
      lpMicros.as("_lp"))
    val perDoc = tokens.join(lp, Seq(langCol, "term"))
      .groupBy(idCol, langCol)
      .agg(count(lit(1)).as("n_toks"), sum("_lp").as("_lps"))
      .select(col(idCol), col(langCol), col("n_toks"),
        Exact.roundPortable(
          col("_lps").cast("double") / 1000000.0 / col("n_toks").cast("double"),
          6).as("avg_lp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(langCol).orderBy(col("avg_lp").desc, col(idCol))
    Pins.sealOutput(
      perDoc.withColumn("bucket", ntile(3).over(w).cast("long"))
        .withColumn("label",
          when(col("bucket") === 1, "head")
            .when(col("bucket") === 2, "middle").otherwise("tail")),
      tokens, lm)
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
    * 2023): select raw docs whose HASHED-BIGRAM feature profile looks like
    * a target slice. Features are bigrams hashed into `buckets` bins; both
    * the target and raw distributions are add-one-smoothed bag-of-buckets
    * models, a doc's log importance weight is
    *
    *   ln w(d) = Σ_positions ln p_tgt(b) − ln p_raw(b)
    *
    * and selection is Gumbel-top-k over `ln w + g_d` (the paper's
    * importance RESAMPLING, derandomized: `g_d = −ln(−ln(u_d))` with
    * `u_d` a seeded per-doc hash — reproducible across runs and engines).
    *
    * Exactness: the two per-BUCKET logs are rounded to micros once per
    * bucket (≤ `buckets` distinct values), per-doc combination is exact
    * long sums; the Gumbel term is rounded to micros from an exactly
    * representable `u = (h + 0.5) / 2^60`. Output: every doc with ≥ 1
    * bigram, its feature count, weight, selection key, and flag.
    *
    * Scale shape: one persisted (doc, bucket) explode feeds target
    * counts, raw counts, and the per-doc rejoin on the same key; the
    * bucket score table is `buckets`-sized (broadcast); the global
    * top-k flag uses one rank window — at 100 TB replace it with a
    * selectivity threshold from `approxQuantile` on the key (the flag is
    * a total-order head either way; the gate keeps the exact rank so the
    * oracle can mirror it).
    */
  def dsirSelect(docs: DataFrame, idCol: String, toks: Column,
      targetPred: Column, buckets: Int = 4096, k: Int = 100,
      salt: String = "dsir"): DataFrame = {
    // buckets = 0 reaches pmod(·, 0) and the +buckets smoothing divisors
    // (round-13 division audit): refuse at the API edge
    require(buckets > 0 && k > 0, s"need buckets > 0 and k > 0, got $buckets/$k")
    val pairs = docs
      .select(col(idCol), targetPred.as("_t"),
        explode(graft.functions.TextAnalysis.bigrams(toks)).as("_big"))
      .select(col(idCol), col("_t"),
        pmod(graft.functions.Hashing.hash60(col("_big"), salt), lit(buckets.toLong))
          .as("bucket"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val raw = pairs.groupBy("bucket").agg(count(lit(1)).as("cr"))
    val tgt = pairs.filter(col("_t")).groupBy("bucket").agg(count(lit(1)).as("ct"))
    val scalars = pairs.agg(count(lit(1)).as("_nr"))
      .crossJoin(pairs.filter(col("_t")).agg(count(lit(1)).as("_nt")))
    val lpT = floor(log((coalesce(col("ct"), lit(0L)) + 1L).cast("double")
      / (col("_nt") + buckets.toLong).cast("double")) * 1000000 + 0.5).cast("long")
    val lpR = floor(log((col("cr") + 1L).cast("double")
      / (col("_nr") + buckets.toLong).cast("double")) * 1000000 + 0.5).cast("long")
    val bucketScores = raw.join(tgt, Seq("bucket"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("bucket"), (lpT - lpR).as("_lr"))
    val u = (graft.functions.Hashing.hash60(col(idCol).cast("string"), salt + "_g")
      .cast("double") + 0.5) / 1152921504606846976.0 // 2^60; u in (0,1) exactly
    val gumbelMicros = floor(-log(-log(u)) * 1000000 + 0.5).cast("long")
    val perDoc = pairs.join(broadcast(bucketScores), "bucket")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feat"), sum("_lr").as("w_micros"))
      .withColumn("key_micros", col("w_micros") + gumbelMicros)
    Pins.sealOutput(
      perDoc.withColumn("selected",
        rank().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("key_micros").desc, col(idCol))) <= k),
      pairs)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher SIGIR'09): combine
    * several ranked lists of the same id space into one ranking by
    * `Σ_lists 1 / (k0 + rank)`. The contribution is computed in exact
    * integer micros (`1000000 DIV (k0 + rank)`), so the fused score is an
    * associative long sum — deterministic under any aggregation tree and
    * bit-equal across engines (the standard k0 = 60 keeps every
    * contribution exactly representable).
    *
    * Each input carries (`idCol`, `rank`) with rank 1-based; ids absent
    * from a list simply contribute nothing. Scale shape: the inputs are
    * top-k lists (k-bounded, not corpus-bounded), so the union + one
    * keyed aggregate + TakeOrdered head is k·lists-sized work.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String,
      k0: Int = 60, topK: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val contribs = rankings.map(df =>
      df.select(col(idCol), expr(s"1000000 DIV ($k0 + rank)").as("_c")))
    contribs.reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(sum("_c").as("rrf_micros"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_micros").desc, col(idCol))
      .limit(topK)
  }
}
