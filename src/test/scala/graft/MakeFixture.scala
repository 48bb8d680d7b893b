package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev harness: materialize a synthetic robot dataset on disk for driving
  * the CLI end-to-end (`sbt "Test/runMain graft.MakeFixture /tmp/robotds"`).
  */
object MakeFixture {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/robotds")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import FixtureGen._
    val episodes = ((0L until 8L).map(e => e -> cleanFrames(e, 20 + e.toInt)) ++ Seq(
      8L -> Defects.unsorted(8, 25),
      9L -> Defects.dupFrames(9, 25),
      10L -> Defects.wrongWidth(10, 25))).toMap
    dataset(spark, root, episodes,
      videosFor = (0L until 11L).toSet,
      metaLengths = episodes.map { case (e, f) => e -> f.size.toLong })
    Files.write(Paths.get(s"$root/meta/episodes_stats.jsonl"),
      statsJsonl(episodes.view.filterKeys(_ < 8).toMap).getBytes)
    println(s"fixture dataset at $root: ${episodes.size} episodes")
    spark.stop()
  }
}
