package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact set-similarity self-join with prefix filtering (the
  * AllPairs/PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08):
  * find ALL pairs with token-set Jaccard ≥ θ without blocking heuristics
  * and without the all-pairs product.
  *
  * The prefix principle: order every record's tokens by a GLOBAL rarity
  * rank (ascending document frequency, rarest first). If
  * |A ∩ B| / |A ∪ B| ≥ θ, then A and B must share at least one token in
  * their first `|X| − ⌈θ·|X|⌉ + 1` tokens under that order — so the
  * candidate join explodes only each record's short prefix and equi-joins
  * on the prefix token. Rare-first ordering makes prefix postings short:
  * the frequent tokens that would create quadratic postings are exactly
  * the ones the prefix skips. This is the exact-join complement to
  * MinHash-LSH (no recall loss, same equi-join shape) and to hash
  * blocking (no per-block quadratic on skewed keys).
  *
  * Scale shape: one groupBy for document frequencies, one per-record sort
  * (array-local, codegen'd), one explode of prefix tokens, one equi-join
  * on the token, a narrow (id, id) distinct, then the verify join brings
  * token payloads back only for surviving candidates (same
  * narrow-candidates lesson as the LSH path). A length filter
  * (⌈θ·|A|⌉ ≤ |B| ≤ |A|/θ) prunes before the set intersection.
  */
object PrefixJoin {

  /** All unordered pairs (id_a < id_b) with distinct-token Jaccard ≥
    * theta. Returns (id_a, id_b, jac).
    */
  def jaccardPairs(docs: DataFrame, idCol: String, toksExpr: Column,
      theta: Double): DataFrame = {
    require(theta > 0 && theta <= 1, s"theta in (0, 1], got $theta")
    val base = docs
      .select(col(idCol).as("id"), array_distinct(toksExpr).as("toks"))
      .where(size(col("toks")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // global rarity rank: ascending document frequency, token as
    // tiebreak — a total order, identical on any engine
    val dfreq = base
      .select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val rankW = Window.orderBy(col("df"), col("tok"))
    // token-rank table is vocab-sized; the window is partition-less but
    // runs over the VOCAB (Zipf-bounded), not the corpus — acceptable at
    // 100 TB where vocab ≪ corpus; swap to PrefixSum.rowNumber if a
    // tokenizer ever makes the vocab corpus-sized
    val ranks = dfreq.select(col("tok"), row_number().over(rankW).as("rk"))
    // per-record tokens sorted by global rank (array-local sort of
    // (rk, tok) structs), plus the prefix slice
    val ranked = base
      .select(col("id"), explode(col("toks")).as("tok"))
      .join(ranks, "tok")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("rk"), col("tok")))).as("rts"))
      .select(col("id"), transform(col("rts"), r => r.getField("tok")).as("stoks"))
      .withColumn("len", size(col("stoks")))
      .withColumn("plen",
        (col("len") - ceil(col("len") * theta) + 1).cast("int"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // candidates: share a prefix token, ordered ids, length-compatible
    val pre = ranked.select(col("id"), col("len"),
      explode(slice(col("stoks"), lit(1), col("plen"))).as("tok"))
    val cand = pre.select(col("id").as("id_a"), col("len").as("la"), col("tok"))
      .join(pre.select(col("id").as("id_b"), col("len").as("lb"), col("tok")), "tok")
      .where(col("id_a") < col("id_b") &&
        col("lb") >= ceil(col("la") * theta) &&
        col("lb") <= floor(col("la") / theta))
      .select("id_a", "id_b")
      .distinct()
    // verify: exact Jaccard on the full token sets, payloads joined AFTER
    // the narrow distinct
    Pins.sealOutput(
      cand
        .join(base.select(col("id").as("id_a"), col("toks").as("ta")), "id_a")
        .join(base.select(col("id").as("id_b"), col("toks").as("tb")), "id_b")
        .select(col("id_a"), col("id_b"), Dedup.jaccard(col("ta"), col("tb")).as("jac"))
        .where(col("jac") >= theta),
      base, ranked)
  }
}
