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
  *
  * Domain: FINITE values only. A NaN/Infinity reaching a scale cast raises a
  * named ANSI CAST_OVERFLOW — identically to DuckDB's CAST(NaN AS BIGINT) —
  * by design: silently nulling non-finite rows out of an EXACT sum would
  * corrupt results invisibly. Quarantine non-finite values upstream (the
  * validate stage owns that), as the reference pipeline does.
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
    *
    * n = 0 reports NULL (the undefined-statistic currency — under ANSI a
    * bare division would raise, round-13 division audit), and the result
    * is clamped at 0: for a CONSTANT input, sum²/n rounds once sum² passes
    * 2⁵³ and can land a hair ABOVE sumsq, which would otherwise hand
    * sqrt a negative and poison downstream exact casts with NaN. The
    * clamp is the same fixed IEEE op on every engine, so bit-compat holds.
    *
    * A NULL radicand (NULL sum/sumsq with n > 0 — e.g. an all-NULL value
    * column counted via count(*), or overflow-degraded sums on a non-ANSI
    * engine) stays NULL (round-14 advice): greatest() skips NULLs, so
    * without the isNotNull gate the clamp would silently read 0.0 where
    * the statistic is undefined. NULL is the undefined-statistic currency.
    * The radicand is evaluated only inside the n > 0 branch, so the ANSI
    * division never sees n = 0.
    */
  def varPopFromSums(sum: Column, sumsq: Column, n: Column): Column = {
    val radicand =
      (sumsq.cast("double") - sum.cast("double") * sum.cast("double") / n.cast("double")) / n.cast("double")
    when(n > 0, when(radicand.isNotNull, greatest(lit(0.0), radicand)))
  }

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

  /** Pin a DECIMAL expression to a representation-stable gate type.
    *
    * The driver's compare harness fetches the Spark side via pyarrow
    * (parquet decimal → `decimal.Decimal`, rendered "506627.00") and the
    * DuckDB side via pandas (decimal → float64, rendered "506627.0"), so
    * ANY decimal column at the gate boundary hash-mismatches on rendering
    * alone even when every value is identical (the round-9 q198 lesson).
    * Keep the decimal arithmetic INSIDE the query; cast the final column
    * to DOUBLE here — exact whenever the value is integer-in-scaled-units
    * and ≪ 2^53, which is every money/quantity total in this repo. The
    * oracle SQL must carry the same `CAST(... AS DOUBLE)`.
    */
  def gateBoundary(c: Column): Column = c.cast("double")

  /** Fail fast when a gate's output schema cannot survive the driver's
    * pandas fetch representation-stably: decimals (see [[gateBoundary]])
    * and nested types (arrays/maps/structs crash the driver's pandas row
    * sort — round-5 q57/q60/q65). Called by [[graft.queries.Q]]'s builder
    * on every gate run, so a bad boundary fails in the gate's own spec at
    * construction instead of as a red driver row a round later.
    */
  def assertBoundarySafe(gate: String, schema: org.apache.spark.sql.types.StructType): Unit = {
    import org.apache.spark.sql.types._
    schema.fields.foreach { f =>
      f.dataType match {
        case _: DecimalType =>
          throw new IllegalArgumentException(
            s"gate $gate: column '${f.name}' is ${f.dataType.simpleString} — " +
            "decimal renders differently per engine through the driver's " +
            "pandas fetch; wrap the final column in Exact.gateBoundary " +
            "(CAST AS DOUBLE) on both engines")
        case _: ArrayType | _: MapType | _: StructType =>
          throw new IllegalArgumentException(
            s"gate $gate: column '${f.name}' is ${f.dataType.simpleString} — " +
            "nested types crash the driver's pandas row sort; project " +
            "through array_join/to_json before the gate boundary")
        case _ => ()
      }
    }
  }
}
