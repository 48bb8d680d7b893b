package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for every left row, the LATEST right row with
  * `right.ts <= left.ts` in the same key group. The time-series join the
  * reference's frame/video alignment implies and Spark lacks as a
  * built-in.
  *
  * Implemented as the union + running-`last(ignoreNulls)` merge, not a
  * range join: both sides are tagged and interleaved in one window
  * ordered by (ts, side, tiebreak), and each left row reads the most
  * recent right-side attributes carried forward by the frame
  * `rowsBetween(unboundedPreceding, current)`.
  *
  * Scale: ONE hash shuffle on the key (the window partition) and a
  * per-partition sort — same cost class as any windowed operator, with
  * no per-key driver loops and no range-explosion (a naive
  * `left.ts >= right.ts` theta-join is O(n·m) per key and un-plannable
  * as an equi-join). Ties: a right row AT the left row's timestamp
  * matches (sides order right-before-left at equal ts); among equal
  * right timestamps the largest tiebreak value wins — pass a total-order
  * column (an id) for deterministic results.
  *
  * `tolerance` (same unit as `ts`) optionally voids matches older than
  * `left.ts - tolerance`, the standard staleness bound.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry onto left rows (renamed
    *                   as given); all left columns pass through.
    */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
      tiebreak: String, valueCols: Seq[(String, String)],
      tolerance: Option[Long] = None): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must name at least one right column")
    val leftCols = left.columns.toSeq
    // side 0 = right sorts BEFORE side 1 = left at equal (ts, …): a right
    // row at exactly left.ts is visible to that left row
    // The matched row travels as ONE struct (_pack) so its timestamp and
    // every value column always come from the SAME right row — per-column
    // carry would backfill a NULL attribute from an older right row.
    // Tiebreak keeps its native type: any orderable column works, and a
    // cross-side type mismatch fails loudly in unionByName instead of
    // degrading to NULL ordering.
    val taggedRight = right.select(
      (Seq(col(key), col(ts).as("_asof_ts"), lit(0).as("_side"),
        col(tiebreak).as("_tb"),
        struct((col(ts).as("_asof_rts") +:
          valueCols.map { case (from, to) => col(from).as(s"_v_$to") }): _*)
          .as("_pack"))): _*)
    val taggedLeft = left.select(
      (Seq(col(key), col(ts).as("_asof_ts"), lit(1).as("_side"),
        col(tiebreak).as("_tb"),
        lit(null).cast(taggedRight.schema("_pack").dataType).as("_pack")) ++
        leftCols.filterNot(c => c == key).map(c => col(c))): _*)
    val unioned = taggedRight
      .select((taggedRight.columns.map(col) ++
        leftCols.filterNot(c => c == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)
      .unionByName(taggedLeft)
    val w = Window.partitionBy(key)
      .orderBy(col("_asof_ts"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_m", last(col("_pack"), ignoreNulls = true).over(w))
    val mTs = col("_m")("_asof_rts")
    val fresh = tolerance match {
      case Some(tol) => mTs.isNotNull &&
        (col("_asof_ts").cast("long") - mTs.cast("long")) <= tol
      case None => mTs.isNotNull
    }
    carried
      .filter(col("_side") === 1)
      .select((Seq(col(key)) ++
        leftCols.filterNot(c => c == key).map(c =>
          if (c == ts) col("_asof_ts").as(ts) else col(c)) ++
        Seq(when(fresh, mTs).otherwise(lit(null)).as(s"asof_$ts")) ++
        valueCols.map { case (_, to) =>
          when(fresh, col("_m")(s"_v_$to")).otherwise(lit(null)).as(to) }): _*)
  }

  /** As-of FORWARD join — for every left row, the EARLIEST right row with
    * `right.ts >= left.ts` in the same key group (the response-attribution
    * shape: purchase → next click, request → next heartbeat). Same
    * union + one-window merge as [[backward]], with the frame flipped to
    * `rowsBetween(currentRow, unboundedFollowing)` + `first(ignoreNulls)`.
    * Ties: a right row AT the left row's timestamp matches (left sorts
    * before right at equal ts); among equal right timestamps the SMALLEST
    * tiebreak wins. `tolerance` voids matches later than `left.ts +
    * tolerance`. Cost class identical to backward: one key shuffle + one
    * per-partition sort, no range explosion.
    */
  def forward(left: DataFrame, right: DataFrame, key: String, ts: String,
      tiebreak: String, valueCols: Seq[(String, String)],
      tolerance: Option[Long] = None): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must name at least one right column")
    val leftCols = left.columns.toSeq
    // side 0 = left sorts BEFORE side 1 = right at equal (ts, …): a right
    // row at exactly left.ts is inside that left row's forward frame
    val taggedRight = right.select(
      (Seq(col(key), col(ts).as("_asof_ts"), lit(1).as("_side"),
        col(tiebreak).as("_tb"),
        struct((col(ts).as("_asof_rts") +:
          valueCols.map { case (from, to) => col(from).as(s"_v_$to") }): _*)
          .as("_pack"))): _*)
    val taggedLeft = left.select(
      (Seq(col(key), col(ts).as("_asof_ts"), lit(0).as("_side"),
        col(tiebreak).as("_tb"),
        lit(null).cast(taggedRight.schema("_pack").dataType).as("_pack")) ++
        leftCols.filterNot(c => c == key).map(c => col(c))): _*)
    val unioned = taggedRight
      .select((taggedRight.columns.map(col) ++
        leftCols.filterNot(c => c == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)
      .unionByName(taggedLeft)
    val w = Window.partitionBy(key)
      .orderBy(col("_asof_ts"), col("_side"), col("_tb"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = unioned
      .withColumn("_m", first(col("_pack"), ignoreNulls = true).over(w))
    val mTs = col("_m")("_asof_rts")
    val fresh = tolerance match {
      case Some(tol) => mTs.isNotNull &&
        (mTs.cast("long") - col("_asof_ts").cast("long")) <= tol
      case None => mTs.isNotNull
    }
    carried
      .filter(col("_side") === 0)
      .select((Seq(col(key)) ++
        leftCols.filterNot(c => c == key).map(c =>
          if (c == ts) col("_asof_ts").as(ts) else col(c)) ++
        Seq(when(fresh, mTs).otherwise(lit(null)).as(s"asof_$ts")) ++
        valueCols.map { case (_, to) =>
          when(fresh, col("_m")(s"_v_$to")).otherwise(lit(null)).as(to) }): _*)
  }
}
