package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing.
  *
  * The reference pipeline derives train/val/test splits and change
  * fingerprints from a *stable seeded hash* (BLAKE2b over canonical bytes,
  * reference `src/neura_pipeline/utils.py:21-40`) — the requirement is
  * determinism across runs/machines under a seed, not a specific digest.
  *
  * We build the portable equivalent from md5 (available in every engine,
  * bit-identical everywhere): take the first 15 hex chars (60 bits — fits a
  * signed 64-bit int) and normalize to [0, 1).
  *
  * Scale note: md5 on a short key string is ~100ns/row and stays inside
  * whole-stage codegen; there is no shuffle, so this is embarrassingly
  * parallel at any scale.
  */
object Hashing {
  /** 2^60 as double — 15 hex chars span [0, 2^60). */
  private val Span: Double = 1152921504606846976.0 // 2^60

  /** Seeded 60-bit hash of a string column → Long in [0, 2^60).
    * Backed by the native fused [[Hash60]] Catalyst expression (codegen'd,
    * one MessageDigest call); [[hash60Composed]] is the built-in-functions
    * form it is bit-identical to — the oracle-SQL mirror and the
    * cross-check in tests.
    */
  def hash60(c: Column, seed: String): Column = Hash60(c, seed)

  /** The composed built-ins form (what an engine without the custom
    * expression would run — and what the DuckDB oracle SQL mirrors).
    */
  def hash60Composed(c: Column, seed: String): Column =
    conv(substring(md5(concat_ws(":", lit(seed), c)), 1, 15), 16, 10).cast("long")

  /** Seeded hash → unit interval [0, 1). Deterministic across engines. */
  def hashUnit(c: Column, seed: String): Column = hash60(c, seed).cast("double") / Span

  /** Driver-side twin of [[hash60]] for precomputing literal tables
    * (e.g. LSH hyperplanes): bit-identical to the column expression.
    */
  def hash60Jvm(c: String, seed: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$c".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Deterministic split assignment (reference materialize_refactored.py:16-26):
    * unit-interval thresholding h < train → "train", h < train+val → "val",
    * else "test". Fraction sanity is validated on the driver by callers.
    */
  def splitAssign(key: Column, seed: String, train: Double, validation: Double): Column = {
    val h = hashUnit(key, seed)
    when(h < train, "train").when(h < train + validation, "val").otherwise("test")
  }

  /** Content fingerprint of a group: md5 over the sorted member encodings
    * (reference fp/fingerprint.py:37-38 combines per-file parts the same way).
    * Order-independent: members are sorted before concatenation.
    */
  def combineFingerprint(parts: Column): Column =
    md5(concat_ws(",", array_sort(parts)))
}
