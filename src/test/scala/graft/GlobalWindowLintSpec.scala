package graft

import java.io.File
import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Partition-less window lint (round-15): `Window.orderBy` with no
  * `partitionBy` funnels EVERY input row into one task — the canonical
  * 100 TB scale-killer — so a site is only acceptable when its input is
  * bounded BY CONSTRUCTION (a grid, a vocab, a top-k list, driver-sized
  * k) and the code says so. The round-15 audit verdicted every existing
  * site; this spec pins that ledger the way DivisionAuditSpec pins the
  * division inventory: a NEW or MOVED partition-less window fails the
  * build until it has been audited for its input bound and the ledger
  * updated (cite the bound class in the entry's comment).
  *
  * The distributed alternative for genuinely corpus-sized global order is
  * [[graft.ops.PrefixSum]] (range-partition + per-partition counts +
  * O(partitions) driver offsets) — see Sampling.epochShuffle for the
  * worked example.
  */
class GlobalWindowLintSpec extends AnyFunSuite {

  private def mainRoot: File = {
    val local = new File("src/main/scala/graft")
    if (local.isDirectory) local else new File("/root/repo/src/main/scala/graft")
  }

  test("partition-less windows: the audited site ledger is exhaustive") {
    // file (relative to graft/) -> occurrence count of "Window.orderBy".
    // Scaladoc PROSE mentions count too — they describe the hazard and
    // must stay in sync with the code they annotate.
    val ledger = Map(
      "ops/SkewProbe.scala" -> 1, // top-k rows only (limit(topK) upstream)
      "ops/Sampling.scala" -> 2, // prioritySample global branch: driver-sized k by contract (scaladoc) + epochShuffle scaladoc prose pointing at PrefixSum
      "ops/TimeSeries.scala" -> 1, // cusum: period grid (one row per day/hour)
      "ops/Sweep.scala" -> 1, // scaladoc prose (names the hazard)
      "ops/PrefixJoin.scala" -> 1, // token-rank table: vocab-sized (Zipf), not corpus
      "ops/Curation.scala" -> 1, // scaladoc prose (PrefixSum pointer)
      "ops/Behavior.scala" -> 1, // runningDistinctUsers: day grid
      "ops/PrefixSum.scala" -> 1, // scaladoc prose (the distributed alternative itself)
      "ops/Corpus.scala" -> 1, // vocabGrowth: grid-sized spine (`points` rows)
      "queries/CurationQueries.scala" -> 2) // q116 RRF: 50-row top-k lists
    val root = mainRoot
    val found = Files.walk(root.toPath).iterator.asScala
      .map(_.toFile).filter(f => f.isFile && f.getName.endsWith(".scala"))
      .flatMap { f =>
        val n = "Window\\.orderBy".r
          .findAllIn(new String(Files.readAllBytes(f.toPath), "UTF-8")).size
        if (n == 0) None
        else Some(root.toPath.relativize(f.toPath).toString
          .replace('\\', '/') -> n)
      }.toMap
    val unexpected = found.toSeq.filter { case (f, n) => ledger.get(f) != Some(n) }
    val missing = ledger.toSeq.filter { case (f, n) => found.get(f) != Some(n) }
    assert(unexpected.isEmpty && missing.isEmpty,
      s"partition-less window ledger drifted.\n" +
        s"unaudited/new sites (audit the input bound, then add to the " +
        s"ledger with its bound class): ${unexpected.mkString(", ")}\n" +
        s"stale ledger entries (site removed or moved): ${missing.mkString(", ")}")
  }
}
