package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Deterministic sampling for training-data curation. Unlike
  * `DataFrame.sample` (seeded per-partition RNG — resample on any
  * repartition, not reproducible across engines or cluster shapes), these
  * samples are pure functions of the row KEY: the same row is in or out of
  * the sample on every run, every engine, every partitioning. That is the
  * property a data pipeline needs — samples that are stable across
  * incremental runs, and strata that can be re-derived from the key alone.
  *
  * Scale shape: the keep/drop decision is a codegen'd hash expression per
  * row (no shuffle, no state); the stratum fraction arrives via a
  * broadcast-joined config frame, so the corpus is scanned exactly once.
  */
object Sampling {

  /** Keep rows whose seeded unit-interval hash of `key` is < `fraction`.
    * E[kept] = fraction · n, deterministic in the key.
    */
  def hashSample(df: DataFrame, key: Column, seed: String, fraction: Column): DataFrame =
    df.filter(Hashing.hashUnit(key.cast("string"), seed) < fraction)

  /** Priority sampling (Duffield-Lund-Thorup, JACM 2007): a weighted
    * sample WITHOUT replacement of the `k` highest-priority rows per
    * group. Row priority is `weight / u` with `u` the seeded unit hash of
    * the key — the exponential-keys family (inclusion probability rises
    * with weight), but unlike `ln`/`pow`-based keys the priority uses ONLY
    * IEEE multiply/divide, which every engine rounds identically, so the
    * selected set is bit-reproducible across engines and topologies.
    * (`u` is computed as `(h+1)/2^60 ∈ (0,1]` so a zero hash cannot divide
    * by zero.) Ties broken by key — a total order.
    *
    * Scale shape: the priority is a per-row codegen'd expression; the
    * per-group top-k is a rank window, which Spark 4 executes with partial
    * WindowGroupLimit pushdown (each map task keeps only its local top-k
    * before the one shuffle). With `groupCols` empty the sample is global
    * and the rank runs single-partition — fine for driver-sized k, use a
    * stratum at corpus scale.
    */
  def prioritySample(df: DataFrame, key: Column, weight: Column, seed: String,
      k: Int, groupCols: Seq[String]): DataFrame = {
    val priority = weight.cast("double") * lit(1152921504606846976.0) /
      (Hashing.hash60(key.cast("string"), seed) + lit(1L)).cast("double")
    val w =
      if (groupCols.isEmpty) Window.orderBy(priority.desc, key)
      else Window.partitionBy(groupCols.map(col): _*).orderBy(priority.desc, key)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Deterministic epoch shuffle: a reproducible pseudo-random global
    * training order. `pos` = rank of the row under the seeded hash of its
    * key (hash asc, key tiebreak, 0-based); `shard` = pos mod `shards`
    * for round-robin worker assignment. One seed per epoch re-deals the
    * permutation, and the order is a pure function of (key, seed) —
    * identical on every engine, cluster shape, and run.
    *
    * Scale shape: a global row number is exactly what `Window.orderBy`
    * without a partition key CANNOT do at scale (every row to one
    * reducer); the position rides the two-pass distributed [[PrefixSum]]
    * over a constant-1 column instead — range-partition by the hash order
    * key, per-partition counts, O(partitions) driver state.
    */
  def epochShuffle(df: DataFrame, key: Column, seed: String, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val base = df
      .withColumn("_ord", struct(
        Hashing.hash60(key.cast("string"), seed).as("h"), key.as("k")))
      .withColumn("_one", lit(1L))
    PrefixSum.exclusive(base, "_ord", "_one", "pos")
      .withColumn("shard", pmod(col("pos"), lit(shards.toLong)))
      .drop("_ord", "_one")
  }

  /** UniMax budget allocation (Chung et al., ICLR 2023 "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): distribute a total token `budget` over groups
    * (languages) as uniformly as possible, except no group may be repeated
    * more than `epochCap` epochs. Groups are visited in ascending size
    * order; each gets
    *
    *   alloc_i = min(epochCap · n_i, rem_i DIV groupsLeft_i)
    *
    * — small languages hit their epoch cap, and the budget they can't
    * absorb is re-spread ("water-filling") over the remaining larger ones.
    * Output per group: `tokens`, exact `alloc` (longs — integer division
    * keeps both engines bit-equal), and `epochs` (portably rounded).
    *
    * Scale shape: the per-group token counts are one distributed aggregate
    * with map-side combine; the recursion itself runs on the collected
    * group table — O(#languages) driver state, the [[PrefixSum]] pattern
    * (a language table is bounded by construction; a `require` caps it
    * loudly at 10k groups).
    */
  def unimaxAlloc(df: DataFrame, grpCol: String, tokCount: Column,
      budget: Long, epochCap: Int): DataFrame = {
    require(budget >= 0 && epochCap > 0, s"bad budget=$budget cap=$epochCap")
    val spark = df.sparkSession
    val per = df.groupBy(grpCol).agg(sum(tokCount).as("tokens"))
      .orderBy(col("tokens"), col(grpCol))
      .limit(10001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    require(per.length <= 10000, "unimaxAlloc: more than 10k groups")
    var rem = budget
    val rows = per.zipWithIndex.map { case ((g, n), i) =>
      val a = math.min(epochCap.toLong * n, rem / (per.length - i))
      rem -= a
      (g, n, a)
    }
    import spark.implicits._
    rows.toSeq.toDF(grpCol, "tokens", "alloc")
      .withColumn("epochs", when(col("tokens") > 0,
        graft.functions.Exact.roundPortable(
          col("alloc").cast("double") / col("tokens").cast("double"), 6))
        .otherwise(lit(0.0)))
  }

  /** Stratified deterministic sample: per-stratum keep fractions from a
    * small (stratum, fraction) frame (broadcast), strata absent from the
    * frame fall back to `defaultFraction`. `fractions` must have exactly
    * two columns: the stratum key (named like `stratumCol`) and
    * `fraction`.
    */
  def stratified(df: DataFrame, stratumCol: String, fractions: DataFrame,
      key: Column, seed: String, defaultFraction: Double): DataFrame = {
    val cols = fractions.columns.toSeq
    require(cols.contains(stratumCol) && cols.contains("fraction") && cols.size == 2,
      s"fractions frame must be ($stratumCol, fraction), got ${cols.mkString(",")}")
    df.join(broadcast(fractions), Seq(stratumCol), "left")
      .withColumn("_frac", coalesce(col("fraction"), lit(defaultFraction)))
      .filter(Hashing.hashUnit(key.cast("string"), seed) < col("_frac"))
      .drop("_frac", "fraction")
  }

  /** EXACT-proportion stratified split: within each stratum, rank rows by
    * (seeded hash, key) and send the first `⌊n·num/den⌋` to "train", the
    * rest to "test" — per-stratum counts land exactly on the quota, unlike
    * the Bernoulli hash-threshold split ([[hashSample]] / splitAssign)
    * whose realized fraction fluctuates ±O(1/√n) per stratum.
    *
    * Scale shape: the per-stratum rank is NOT a per-stratum window (one
    * hot stratum = one reducer). It is the distributed global
    * [[PrefixSum.rowNumber]] over (stratum, hash, key) — fully
    * range-partitioned — minus each stratum's first global rank (a
    * stratum-sized broadcast join). Two passes over the data, no
    * single-reducer stage, any stratum skew tolerated.
    */
  def exactStratifiedSplit(df: DataFrame, stratumCol: String, key: Column,
      seed: String, trainNum: Int, trainDen: Int): DataFrame = {
    require(trainNum >= 0 && trainDen > 0 && trainNum <= trainDen,
      s"train fraction $trainNum/$trainDen out of [0,1]")
    val withH = df
      .withColumn("_h", Hashing.hash60(key.cast("string"), seed))
      .withColumn("_k", key)
    val rn = PrefixSum.rowNumber(withH, Seq(stratumCol, "_h", "_k"), "_rn")
    val offs = rn.groupBy(stratumCol)
      .agg(min(col("_rn")).as("_off"), count(lit(1)).as("_n"))
    rn.join(broadcast(offs), Seq(stratumCol))
      .withColumn("_rank", col("_rn") - col("_off") + 1L)
      .withColumn("split",
        when(col("_rank") * trainDen <= col("_n") * trainNum, "train")
          .otherwise("test"))
      .drop("_h", "_k", "_rn", "_off", "_n", "_rank")
  }
}
