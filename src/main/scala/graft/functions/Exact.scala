package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact (order-independent) arithmetic helpers.
  *
  * Double summation is order-dependent; a distributed partial aggregation
  * (Spark) and a sequential scan (an oracle engine) can disagree in the last
  * few ulps, which breaks bit-exact result comparison AND makes runs
  * non-reproducible across cluster sizes. At 100 TB the partial-aggregation
  * tree is deep and nondeterministic in shape, so any double-sum is
  * nondeterministic in the low bits.
  *
  * Fix: scale to integers as early as possible (money → cents), aggregate in
  * Long (exact, associative, commutative — deterministic under ANY shuffle or
  * partial-agg tree), and convert back to double only at the very end with a
  * fixed, deterministic sequence of IEEE ops.
  */
object Exact {
  /** Money column (2 decimals) → exact cents as Long. */
  def cents(c: Column): Column = round(c * 100).cast(LongType)

  /** Fixed-point scale by 1e6 (floats / small reals) → Long. */
  def micros(c: Column): Column = round(c * 1000000).cast(LongType)

  /** Back to double: exact Long cents → double with deterministic division. */
  def fromCents(c: Column): Column = c.cast("double") / 100.0

  def fromMicros(c: Column): Column = c.cast("double") / 1000000.0

  /** Population variance from exact integer (sum, sumsq, n): computed with a
    * fixed IEEE sequence so any engine gets bit-identical doubles.
    */
  def varPopFromSums(sum: Column, sumsq: Column, n: Column): Column =
    (sumsq.cast("double") - sum.cast("double") * sum.cast("double") / n.cast("double")) / n.cast("double")

  def stddevPopFromSums(sum: Column, sumsq: Column, n: Column): Column =
    sqrt(varPopFromSums(sum, sumsq, n))

  /** Engine-portable rounding: `floor(x·10ⁿ + 0.5) / 10ⁿ` using only IEEE
    * ops, which every engine computes bit-identically. Native `round()`
    * implementations differ at representational boundaries (BigDecimal
    * half-up in Spark vs double-multiply in DuckDB) and CANNOT be matched.
    */
  def roundPortable(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * p + 0.5).cast("double") / p
  }

  /** The DuckDB-SQL twin of [[roundPortable]] for oracle queries. */
  def roundPortableSql(exprSql: String, digits: Int): String = {
    val p = "1" + "0" * digits
    s"CAST(floor(($exprSql) * $p + 0.5) AS BIGINT) / CAST($p AS DOUBLE)"
  }
}
