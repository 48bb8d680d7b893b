package graft

import org.apache.spark.sql.functions._
import graft.functions.Exact
import graft.queries.Q

/** The representation-safe gate-boundary rule (round-9 q198 lesson): the
  * driver fetches the Spark side via pyarrow (parquet DECIMAL →
  * decimal.Decimal, "506627.00") and the oracle side via pandas (DuckDB
  * decimal → float64, "506627.0"), so a decimal column at the gate
  * boundary hash-mismatches on RENDERING with every value identical.
  * Nested types are worse — they crash the driver's pandas row sort
  * (round-5 q57/q60/q65). Q's builder therefore rejects both at gate
  * construction; Exact.gateBoundary is the sanctioned escape hatch.
  */
class GateBoundarySpec extends SparkSuite {

  private def df = {
    import spark.implicits._
    Seq((1L, "A")).toDF("k", "flag")
  }

  test("a DECIMAL(38,2) gate column fails at construction, not at the driver") {
    val q = Q("q_test_decimal", "SELECT 1") { (s, _) =>
      df.select(col("k").cast("decimal(38,2)").as("total"), col("flag"))
    }
    val e = intercept[IllegalArgumentException] { q.run(spark, "unused") }
    assert(e.getMessage.contains("total"))
    assert(e.getMessage.contains("gateBoundary"))
  }

  test("LOW-precision decimal is rejected too — DuckDB degrades every decimal to float64") {
    val q = Q("q_test_decimal_lo", "SELECT 1") { (s, _) =>
      df.select(col("k").cast("decimal(12,2)").as("total"))
    }
    intercept[IllegalArgumentException] { q.run(spark, "unused") }
  }

  test("an array-typed gate column fails at construction") {
    val q = Q("q_test_array", "SELECT 1") { (s, _) =>
      df.select(array(col("k")).as("ks"))
    }
    val e = intercept[IllegalArgumentException] { q.run(spark, "unused") }
    assert(e.getMessage.contains("ks"))
  }

  test("gateBoundary pins a decimal sum to DOUBLE and the gate passes") {
    val q = Q("q_test_ok", "SELECT 1") { (s, _) =>
      df.groupBy("flag")
        .agg(Exact.gateBoundary(sum(col("k").cast("decimal(12,2)")))
          .as("total"))
    }
    val out = q.run(spark, "unused")
    assert(out.schema("total").dataType.typeName == "double")
    assert(out.select("total").collect().map(_.getDouble(0)).toSeq == Seq(1.0))
  }

  test("plain scalar schemas pass the boundary untouched") {
    val q = Q("q_test_scalars", "SELECT 1") { (s, _) =>
      df.select(col("k"), col("flag"), lit(1.5).as("x"),
        lit(true).as("b"), current_date().as("d"))
    }
    assert(q.run(spark, "unused").count() == 1L)
  }
}
