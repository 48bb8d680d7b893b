package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star-schema testdata (TESTDATA.md).
  * One parquet file per table under `dir`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // The loaders below assert the column types the engine's arithmetic
  // depends on (round-6 lesson: the driver regenerates testdata between
  // rounds, and a silent physical-type change either kills gates with deep
  // Catalyst errors or — worse — silently changes results, e.g. a DECIMAL
  // price would round cents differently). Temporal columns accept the
  // date/timestamp family (downstream casts normalize); numeric and string
  // columns are pinned. Schema-only checks — no data is read.
  import org.apache.spark.sql.types._
  private val temporal: Set[DataType] =
    Set(DateType, TimestampType, TimestampNTZType)

  def lineitem(s: SparkSession, d: String): DataFrame =
    assertColumnTypes(load(s, d, "lineitem"), "lineitem",
      "l_orderkey" -> Set[DataType](LongType),
      "l_quantity" -> Set[DataType](DoubleType),
      "l_extendedprice" -> Set[DataType](DoubleType),
      "l_discount" -> Set[DataType](DoubleType),
      "l_shipdate" -> temporal)
  def orders(s: SparkSession, d: String): DataFrame =
    assertColumnTypes(load(s, d, "orders"), "orders",
      "o_orderkey" -> Set[DataType](LongType),
      "o_custkey" -> Set[DataType](LongType),
      "o_totalprice" -> Set[DataType](DoubleType),
      "o_orderdate" -> temporal)
  def customer(s: SparkSession, d: String): DataFrame =
    assertColumnTypes(load(s, d, "customer"), "customer",
      "c_custkey" -> Set[DataType](LongType),
      "c_acctbal" -> Set[DataType](DoubleType))
  // The four dimension tables get the same drift tripwire as the facts
  // (round-7 advice #7: these were raw `load`, a side door for the next
  // regeneration to revive the round-6 failure mode). Key columns accept
  // either integral width unchanged (gates that output them raw must keep
  // the physical type the oracle sees); money columns are pinned DOUBLE.
  def supplier(s: SparkSession, d: String): DataFrame =
    assertColumnTypes(load(s, d, "supplier"), "supplier",
      "s_suppkey" -> Set[DataType](IntegerType, LongType),
      "s_name" -> Set[DataType](StringType),
      "s_nationkey" -> Set[DataType](IntegerType, LongType),
      "s_acctbal" -> Set[DataType](DoubleType))
  def part(s: SparkSession, d: String): DataFrame =
    assertColumnTypes(load(s, d, "part"), "part",
      "p_partkey" -> Set[DataType](IntegerType, LongType),
      "p_name" -> Set[DataType](StringType),
      "p_brand" -> Set[DataType](StringType),
      "p_size" -> Set[DataType](IntegerType, LongType),
      "p_retailprice" -> Set[DataType](DoubleType))
  def nation(s: SparkSession, d: String): DataFrame =
    assertColumnTypes(load(s, d, "nation"), "nation",
      "n_nationkey" -> Set[DataType](IntegerType, LongType),
      "n_name" -> Set[DataType](StringType),
      "n_regionkey" -> Set[DataType](IntegerType, LongType))
  def region(s: SparkSession, d: String): DataFrame =
    assertColumnTypes(load(s, d, "region"), "region",
      "r_regionkey" -> Set[DataType](IntegerType, LongType),
      "r_name" -> Set[DataType](StringType))
  /** The events table's `ts` column has drifted across testdata generations:
    * parquet TIMESTAMP(NANOS) (which Spark's vectorized reader only accepts
    * via spark.sql.legacy.parquet.nanosAsLong, surfacing as INT64) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (surfacing as TIMESTAMP_NTZ).
    * Never assume one encoding: sniff the loaded type and normalize to a
    * session-TZ TimestampType in microseconds. All entry points pin the
    * session TZ to UTC, so the NTZ cast preserves the wall-clock as UTC epoch
    * — the same interpretation the DuckDB oracle gives a naive timestamp.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = assertColumnTypes(load(s, d, "events"), "events",
      "event_id" -> Set[DataType](LongType),
      "user_id" -> Set[DataType](LongType),
      "value" -> Set[DataType](DoubleType),
      "event_type" -> Set[DataType](StringType))
    raw.withColumn("ts", normalizeTs(raw.schema("ts").dataType, "events"))
  }

  /** Normalize a drifting event-time column to TimestampType (micros).
    *  - LongType: legacy INT64 nanos (via nanosAsLong) → integer-DIV to µs;
    *    a double division would lose precision at ~1.7e18 ns, and truncation
    *    (not rounding) matches a ns→µs TIMESTAMP cast in ANSI engines.
    *  - TimestampNTZType: wall-clock reinterpreted in the session TZ (UTC).
    *  - TimestampType: already what we want.
    * Any other physical type is a hard, named error — fail here with the
    * table/column/type rather than deep in Catalyst with DATATYPE_MISMATCH.
    */
  def normalizeTs(found: org.apache.spark.sql.types.DataType, table: String,
      column: String = "ts"): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    found match {
      case LongType         => expr(s"timestamp_micros($column DIV 1000)")
      case TimestampNTZType => col(column).cast(TimestampType)
      case TimestampType    => col(column)
      case other => throw new IllegalArgumentException(
        s"graft.Tables: unsupported physical type for $table.$column: got " +
          s"${other.sql}; supported: BIGINT (legacy int64-nanos), " +
          "TIMESTAMP_NTZ (parquet micros), TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    assertColumnTypes(load(s, d, "documents"), "documents",
      "doc_id" -> Set[DataType](LongType),
      "text" -> Set[DataType](StringType),
      "source" -> Set[DataType](StringType),
      "lang" -> Set[DataType](StringType),
      "n_chars" -> Set[DataType](LongType))

  /** Guard against physical-type drift in driver-regenerated testdata: check
    * each named column's loaded type against its supported set and fail with
    * a single actionable message (table, column, found vs supported) instead
    * of a deep Catalyst DATATYPE_MISMATCH ten operators downstream.
    *
    * Benign drift is CONFORMED, not fatal (the round-6 lesson cuts both
    * ways — a hard assert on INT32 vs INT64 would recreate the dead-gate
    * disaster on the next regeneration): when the supported set names a
    * canonical integral (LongType) or floating (DoubleType) type, any
    * narrower member of the same family loads fine and is cast up to the
    * canonical type, so downstream arithmetic sees one width everywhere.
    * DECIMAL is deliberately NOT accepted for double columns — decimal
    * aggregation semantics differ from IEEE double on both engines, and
    * that drift deserves a loud stop, not a silent cast.
    */
  def assertColumnTypes(df: DataFrame, table: String,
      expected: (String, Set[org.apache.spark.sql.types.DataType])*): DataFrame = {
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val floating: Set[DataType] = Set(FloatType, DoubleType)
    def widened(ok: Set[DataType], found: DataType): Option[DataType] =
      if (ok.contains(LongType) && integral.contains(found)) Some(LongType)
      else if (ok.contains(DoubleType) && floating.contains(found)) Some(DoubleType)
      else None
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    val casts = scala.collection.mutable.ArrayBuffer.empty[(String, DataType)]
    expected.foreach { case (name, ok) =>
      df.schema.find(_.name == name) match {
        case None => problems += s"$table.$name: column missing from loaded schema"
        case Some(f) if ok.contains(f.dataType) => ()
        case Some(f) => widened(ok, f.dataType) match {
          case Some(canonical) => casts += (name -> canonical)
          case None =>
            problems += s"$table.$name: got ${f.dataType.sql}; supported: " +
              ok.map(_.sql).toSeq.sorted.mkString(", ")
        }
      }
    }
    if (problems.nonEmpty) throw new IllegalArgumentException(
      "graft.Tables schema drift — " + problems.mkString("; "))
    casts.foldLeft(df) { case (d, (name, t)) =>
      d.withColumn(name, org.apache.spark.sql.functions.col(name).cast(t)) }
  }

  /** Documents spread across the default parallelism: the testdata tables
    * are single-file single-row-group parquet (ONE input split), so any
    * per-document heavy expression must be preceded by a repartition or it
    * runs on one core.
    */
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String): DataFrame =
    assertColumnTypes(load(s, d, "embeddings"), "embeddings",
      "vec_id" -> Set[DataType](LongType),
      // scaled-int math casts through double, so either float width loads
      "embedding" -> Set[DataType](
        ArrayType(FloatType), ArrayType(DoubleType),
        ArrayType(FloatType, containsNull = false),
        ArrayType(DoubleType, containsNull = false)),
      "label" -> Set[DataType](IntegerType, LongType))
}
