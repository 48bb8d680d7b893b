package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev harness: a corpus with the REFERENCE dataset's dimensions
  * (robot_data/meta/info.json: 102 episodes, 37,357 frames, 1 chunk,
  * 2 views) for end-to-end scale smoke runs of `cli.Main pipeline`:
  * `sbt "Test/runMain graft.MakeRefScaleCorpus /tmp/refscale"`.
  */
object MakeRefScaleCorpus {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/refscale")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import FixtureGen._
    // 25 episodes of 367 frames + 77 of 366 = 37,357 (reference total)
    val episodes = (0L until 102L).map { e =>
      e -> cleanFrames(e, if (e < 25) 367 else 366)
    }.toMap
    dataset(spark, root, episodes,
      videosFor = (0L until 102L).toSet,
      metaLengths = episodes.map { case (e, f) => e -> f.size.toLong })
    Files.write(Paths.get(s"$root/meta/episodes_stats.jsonl"),
      statsJsonl(episodes).getBytes)
    println(s"ref-scale corpus at $root: ${episodes.size} episodes, " +
      s"${episodes.valuesIterator.map(_.size).sum} frames")
    spark.stop()
  }
}
