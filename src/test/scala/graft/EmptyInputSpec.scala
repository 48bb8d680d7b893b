package graft

import graft.tools.EmptySweep

/** The round-12 empty-input contract, pinned: EVERY gate, run against
  * zero-row tables with the real schemas, either returns a result or
  * refuses with a deliberate, well-messaged error — never an NPE /
  * MatchError / opaque internals artifact. Operationally this is the
  * "first day a partition filter matches nothing" class; the sweep that
  * motivated it (tools/EmptySweep) found nine distinct failure modes
  * across streaming drains, write-then-read gates, plan-shape tripwires
  * and codebook builders.
  */
class EmptyInputSpec extends SparkSuite {

  private def sweep(rows: Int): Seq[String] = {
    val out = tmpDir(s"graft_degen_${rows}_spec")
    EmptySweep.writeTables(spark, "/root/testdata/sf0.001", out, rows)
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, out).count(); None }
      catch {
        case e: Throwable =>
          EmptySweep.crashIn(e) match {
            case Some(crash) =>
              Some(s"$name crashed: ${crash.getClass.getName}: " +
                s"${crash.getMessage}")
            case None => None // deliberate refusal — allowed
          }
      } finally graft.ops.Pins.releaseAll(spark)
    }
  }

  test("all gates survive zero-row inputs: return or refuse loudly") {
    val failures = sweep(0)
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("all gates survive 3-row inputs: return or refuse loudly") {
    // the shape that found MLlib's KMeansAggregator index crash (n < k)
    // and the parquet row-group-pruning false alarms in the streaming
    // tripwire/drain accounting
    val failures = sweep(3)
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("all gates survive null payloads: return or refuse loudly") {
    // identity intact, every other nullable column NULL — the shape that
    // found four getSeq NPEs (PQ seeds, PQ/ADC query slices, IVF
    // centroids, MMR candidates) and q192's ANSI divide-by-zero
    val out = tmpDir("graft_nulls_spec")
    EmptySweep.writeNullTables(spark, "/root/testdata/sf0.001", out, 3)
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, out).count(); None }
        catch {
          case e: Throwable =>
            EmptySweep.crashIn(e) match {
              case Some(crash) =>
                Some(s"$name crashed: ${crash.getClass.getName}: " +
                  s"${crash.getMessage}")
              case None => None
            }
        } finally graft.ops.Pins.releaseAll(spark)
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
