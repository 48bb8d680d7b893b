package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Count-min sketch over a token stream, as pure DataFrame aggregation —
  * the sub-linear-memory twin of the exact heavy hitters (ops/TfIdf):
  * `depth` seeded hash rows × `width` buckets; a term's estimate is the
  * MINIMUM of its bucket counts across rows. Estimates never undercount
  * (every occurrence lands in the term's bucket) and overcount by at most
  * the collision mass, bounded in expectation by total/width per row —
  * taking the min across depth independent rows drives the error to the
  * classic ε=e/width, δ=e^-depth guarantee.
  *
  * Scale shape: the sketch is ONE aggregation of depth × width cells
  * (fixed size regardless of corpus — 4×8192 cells here vs a vocabulary
  * that can be billions of terms); building it is a map-side-combined
  * groupBy on (row, bucket). Querying joins candidate terms against the
  * cell table on the same derived keys — broadcast-sized by construction.
  */
object CountMin {

  /** Bucket id of `term` for sketch row `row` under `seed`. */
  def bucket(term: Column, row: Int, seed: String, width: Int): Column = {
    // pmod(·, 0) raises under ANSI (round-13 division audit)
    require(width > 0, s"sketch width must be > 0, got $width")
    pmod(Hashing.hash60(term, s"$seed:$row"), lit(width.toLong))
  }

  /** Build the sketch: one row per non-empty (row, bucket) cell. Each
    * occurrence explodes into `depth` (row, bucket) pairs with the row id
    * folded into the hash seed as a compile-time constant (codegen'd).
    */
  def sketch(terms: DataFrame, termCol: String, depth: Int, width: Int,
      seed: String): DataFrame =
    terms.select(col(termCol).as("_term"))
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("_row"),
          bucket(col("_term"), r, seed, width).as("_bucket"))): _*)).as("_rb"))
      .groupBy(col("_rb._row").as("_row"), col("_rb._bucket").as("_bucket"))
      .agg(count(lit(1)).as("cell_count"))

  /** Estimate counts for `queries` (a frame with `termCol`): min across
    * the sketch rows of the term's cell counts. Terms whose every bucket
    * is empty estimate 0.
    */
  def estimate(sketchDf: DataFrame, queries: DataFrame, termCol: String,
      depth: Int, width: Int, seed: String): DataFrame = {
    val withBuckets = queries.select(col(termCol),
      explode(array((0 until depth).map(r =>
        struct(lit(r).as("_row"), bucket(col(termCol), r, seed, width).as("_bucket"))): _*))
        .as("_rb"))
      .select(col(termCol), col("_rb._row").as("_row"), col("_rb._bucket").as("_bucket"))
    withBuckets
      .join(sketchDf, Seq("_row", "_bucket"), "left")
      .groupBy(termCol)
      .agg(min(coalesce(col("cell_count"), lit(0L))).as("est_count"))
  }
}
