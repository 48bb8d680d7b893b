package graft

import org.apache.spark.sql.functions._
import graft.ops.ZOrder

/** Z-order layout: expression parity with the reference implementation and
  * the data-skipping property that motivates it.
  */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("zValue2 column expression matches the reference bit-interleave") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(500)((rnd.nextLong().abs % (1L << 31), rnd.nextLong().abs % (1L << 31)))
    val got = pts.toDF("x", "y")
      .select(ZOrder.zValue2(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val want = pts.map { case (x, y) => ZOrder.zValue2Ref(x, y) }
    assert(got === want)
  }

  test("z-order chunks prune balanced on BOTH dimensions; row-major only on one") {
    // 64×64 grid, 16 chunks of 256 rows each. A z-sorted chunk is a 16×16
    // tile; a row-major chunk is a 64×4 stripe. A selective filter on x
    // then touches 4/16 z-chunks but ALL 16 row-major chunks — the
    // file-stats pruning story in one assert.
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)

    def chunkBoxes(sorted: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] =
      sorted.grouped(256).map { c =>
        (c.map(_._1).min, c.map(_._1).max, c.map(_._2).min, c.map(_._2).max)
      }.toSeq

    val zSorted = grid.sortBy { case (x, y) => ZOrder.zValue2Ref(x, y) }
    val rowMajor = grid.sortBy { case (x, y) => (y, x) }
    val zBoxes = chunkBoxes(zSorted)
    val rmBoxes = chunkBoxes(rowMajor)

    // z-chunks are exact 16×16 tiles
    assert(zBoxes.forall { case (x0, x1, y0, y1) => x1 - x0 == 15 && y1 - y0 == 15 })

    val zTouchX = zBoxes.count { case (x0, _, _, _) => x0 < 16 }
    val rmTouchX = rmBoxes.count { case (x0, _, _, _) => x0 < 16 }
    val zTouchY = zBoxes.count { case (_, _, y0, _) => y0 < 16 }
    val rmTouchY = rmBoxes.count { case (_, _, y0, _) => y0 < 16 }
    assert(zTouchX === 4 && zTouchY === 4) // balanced pruning
    assert(rmTouchX === 16 && rmTouchY === 4) // x-filter cannot prune stripes
  }

  test("layoutByZ range-partitions by z and sorts within partitions") {
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val laid = ZOrder.layoutByZ(grid, "x", "y", numFiles = 4)
    // each partition holds a contiguous, internally-sorted z-range
    val parts = laid.select(col("_z"), spark_partition_id().as("pid"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val byPid = parts.groupBy(_._2).toSeq.sortBy(_._1).map(_._2.map(_._1).toSeq)
    byPid.foreach(zs => assert(zs === zs.sorted))
    val ranges = byPid.map(zs => (zs.min, zs.max)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi <= lo)
      case _ =>
    }
  }
}
