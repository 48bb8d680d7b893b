package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (the 100 TB hot-key tool next to AQE's
  * automatic skew splitting).
  *
  * A plain shuffle join on a low-cardinality or Zipfian key sends every
  * row of a hot key to ONE reducer. Salting breaks each key into `salts`
  * sub-keys: the big side gets a deterministic salt from a portable hash
  * of a unique row key (so re-runs and retries place rows identically —
  * no `rand()`, which would be nondeterministic under task retry), and
  * the small side is replicated once per salt. The join key becomes
  * (key, salt): same result set, `salts`× the reducers for a hot key.
  *
  * Result equality with the unsalted join is gated bit-for-bit (q40).
  */
object SkewJoin {

  /** @param bigRowKey a unique-ish column of `big` used only to derive the
    *                  deterministic salt (any stable id works; collisions
    *                  just co-locate rows, never corrupt results; nulls
    *                  fall into one fixed salt)
    * @param joinType  inner or any left-side type — right/full outer would
    *                  return each unmatched small row once per salt, so
    *                  they are rejected
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      bigRowKey: Column, salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Set("inner", "left", "leftouter", "left_outer", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross").contains(
        joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin preserves plain-join semantics only for inner/left joins, got $joinType")
    val salted = big.withColumn("_salt",
      pmod(graft.functions.Hashing.hash60(
        coalesce(bigRowKey.cast("string"), lit("")), "salt"), lit(salts.toLong)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
