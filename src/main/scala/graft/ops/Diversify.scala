package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98) diverse
  * top-k: greedily pick the candidate maximizing
  * `sim(query) − λ·max_sim(selected)` — the exemplar-selection /
  * dedup-aware retrieval op (top-k WITHOUT k near-copies of the best hit).
  *
  * Determinism contract: similarities are the exact scaled-integer cosine
  * rounded to 1e-6 ([[Similarity]] / q29's formula) BEFORE any score
  * arithmetic, and ties break on the smaller id — so the greedy trace
  * replays exactly on another engine.
  *
  * Scale shape: greedy MMR is inherently k sequential passes; what each
  * pass costs is the design choice. The max-sim-to-selected term updates
  * INCREMENTALLY — one `greatest(prev, sim(·, newest pick))` projection
  * per round against the newest pick's vector only (a driver-held
  * array literal), never a candidates × selected join — so each round is
  * one map pass + one argmax aggregate over the candidate table, O(n·dim)
  * per round, k·O(n·dim) total. The per-round localCheckpoint keeps the
  * plan depth constant.
  */
object Diversify {

  /** Pick `k` diverse ids relevant to `queryId`'s vector; returns
    * (rank, idCol) with rank 1..k in pick order. The query row itself is
    * excluded from the candidates.
    *
    * `poolCap` (0 = off) is the documented scale lever: each MMR round
    * checkpoints the candidate table, so a pool of P rows pays k·P row
    * writes — at P ≫ 1M that dominates. Capping keeps the TOP `poolCap`
    * candidates by query-relevance (ties to the smaller id, so the cap is
    * deterministic) BEFORE the greedy loop; a candidate outside the
    * relevance top-P can only enter an MMR result through the diversity
    * term, which at sane λ never outweighs a large relevance deficit —
    * the standard retrieve-then-rerank contract (the probe measured
    * 0.44 s/round at P = 200k; cap ≈ 100k·max(1, k/50) is a good
    * default). The cap stage itself is a P-bounded sort-limit
    * (TakeOrderedAndProject — per-partition partial top-P + one merge,
    * never a global sort).
    */
  def mmrTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, lambda: Double, poolCap: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(poolCap == 0 || poolCap >= k,
      s"poolCap=$poolCap would cap below k=$k")
    val spark = df.sparkSession
    import spark.implicits._
    // null embeddings can be neither query nor candidate (no similarity
    // is defined for them) — candidates are filtered here, the query is a
    // named refusal (round-12 null-payload sweep: both NPE'd on getSeq)
    val sv0 = df.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("_id"),
        Similarity.scaled(col(vecCol)).as("_s"))
    val qRows = sv0.where(col("_id") === queryId)
      .select(col("_s")).limit(1).collect()
    require(qRows.nonEmpty,
      s"mmrTopK: query id $queryId not found in column '$idCol' " +
        "(or its vector is null)")
    val qVec: Seq[Long] = qRows.head.getSeq[Long](0)
    def r6(c: org.apache.spark.sql.Column) =
      graft.functions.Exact.roundPortable(c, 6)
    // q29's cosine shape: dot / (sqrt(aa) · sqrt(bb)), rounded at 1e-6.
    // Zero vectors are LEGAL (only nulls are filtered): an all-zero query
    // is decided at plan time, an all-zero candidate by the same when()
    // guard Similarity.cosine uses — either would otherwise raise ANSI
    // divide-by-zero inside the norm product (round-13 division audit)
    def cosTo(vec: Seq[Long]): org.apache.spark.sql.Column = {
      val v = typedLit(vec)
      val nb = math.sqrt(vec.map(x => x.toDouble * x).sum)
      if (nb == 0.0) r6(lit(0.0))
      else {
        val aa = Similarity.dotScaled(col("_s"), col("_s")).cast("double")
        r6(when(aa > 0, Similarity.dotScaled(col("_s"), v).cast("double") /
          (sqrt(aa) * nb)).otherwise(lit(0.0)))
      }
    }
    val pool0 = sv0.where(col("_id") =!= queryId)
      .withColumn("_sq", cosTo(qVec))
    val pool = if (poolCap > 0)
      // TakeOrderedAndProject: per-partition top-P + one P-sized merge
      pool0.orderBy(col("_sq").desc, col("_id").asc).limit(poolCap)
      else pool0
    var cands = pool
      .withColumn("_maxSel", lit(null).cast("double"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nCands = cands.count()
    // once every candidate is picked the argmax aggregate returns a null
    // struct and getLong would NPE opaquely — fail loudly up front instead
    require(k <= nCands, s"mmrTopK: k=$k exceeds the $nCands candidate(s) " +
      s"(corpus minus the query row); lower k or widen the candidate pool")
    var picked = Vector.empty[Long]
    for (_ <- 1 to k) {
      val score = when(col("_maxSel").isNull, col("_sq"))
        .otherwise(col("_sq") - lit(lambda) * col("_maxSel"))
      // argmax with smaller-id ties, one aggregate — no sort, no limit
      val top = cands.where(!col("_id").isInCollection(picked))
        .agg(min(struct((-score).as("ns"), col("_id").as("id"))).as("m"))
        .select(col("m.id")).head().getLong(0)
      picked = picked :+ top
      val topVec = cands.where(col("_id") === top)
        .select(col("_s")).head().getSeq[Long](0)
      val next = cands.withColumn("_maxSel",
          greatest(coalesce(col("_maxSel"), lit(-1.0)), cosTo(topVec)))
        .localCheckpoint()
      cands.unpersist(false)
      cands = next
    }
    cands.unpersist(false)
    picked.zipWithIndex
      .map { case (id, i) => (i + 1L, id) }
      .toDF("rank", idCol)
  }
}
