package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (and the LLM-pipeline extensions) is
  * exposed as a named query over the driver testdata; `oracleSql` carries the
  * DuckDB-equivalent SQL for the hash-match correctness gate.
  */
object SparkEntry {

  /** All gate-visible queries, one per implemented operator. */
  private def modules: Seq[Q] =
    Relational.all ++ TextQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ StreamingQueries.all ++ SamplingQueries.all ++
      CorpusQueries.all ++ GraphQueries.all ++ CurationQueries.all ++
      BpeQueries.all ++ ClassifierQueries.all ++ BehaviorQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q02RevenueByNation.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
