package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply / latest-wins upsert: merge a change set into a base snapshot
  * without a table format — the MERGE pattern the reference's manifest
  * update (SURVEY T1/T4: fingerprint CDC + tombstones) and any incremental
  * training-data feed both reduce to.
  *
  * Contract: `base` and `changes` share a schema that carries the key
  * columns, one or more version columns (total order within a key —
  * ties across the version columns make the winner nondeterministic, so
  * callers append a unique id as the last version column), and a boolean
  * tombstone column. Per key, the row with the highest version wins; a
  * winning tombstone deletes the key.
  *
  * Scale shape: ONE shuffle (the window partition on the key). The change
  * set is usually ≪ base; no broadcast is attempted because the window
  * needs co-partitioned full rows anyway — at 100 TB this is the same
  * shape as dedup-keep-first (W2), which AQE handles with skew splitting
  * if one key is hot (keys are unique in base, so hot keys only arise
  * from pathological change storms).
  */
object Upsert {

  /** Apply `changes` over `base`, both already aligned to the same schema.
    * Returns the merged snapshot (tombstoned keys removed, `versionCols`
    * and `deleteCol` retained for lineage).
    *
    * `dropTombstones = false` keeps the winning tombstone ROW instead of
    * deleting the key — required when the merge is applied incrementally
    * (streaming/IncrementalMerge): dropping a tombstone forgets its
    * version, so a LATE change with an older version would wrongly
    * resurrect the key in a later batch. With tombstones retained the
    * merge is associative — incremental application over any batch split
    * equals one-shot application — and the live view is just
    * `filter(!deleteCol)` at read time.
    */
  def latestWins(base: DataFrame, changes: DataFrame, keys: Seq[String],
      versionCols: Seq[String], deleteCol: String,
      dropTombstones: Boolean = true): DataFrame = {
    require(base.columns.sorted.sameElements(changes.columns.sorted),
      s"base/changes schemas differ: ${base.columns.mkString(",")} vs ${changes.columns.mkString(",")}")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(versionCols.map(c => col(c).desc): _*)
    val merged = base.unionByName(changes)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    // NULL in the tombstone column means "not a delete", not "delete":
    // under three-valued logic a bare !col would silently drop the key.
    if (dropTombstones) merged.filter(!coalesce(col(deleteCol), lit(false)))
    else merged
  }
}
