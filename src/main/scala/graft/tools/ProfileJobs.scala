package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev-only: run one gate and decompose its wall time into Spark JOBS —
  * per-job duration, stage/task counts, and the gaps between jobs (driver
  * work: planning, broadcast builds, oracle-side collects). The guide's
  * §1 "measure first" step for gates dominated by fixed overheads rather
  * than data volume: at sf0.1 most of the board is job-count-bound, so
  * the first question for any slow gate is "how many jobs, and where are
  * the gaps", not "which stage shuffles most".
  *
  * Usage: runMain graft.tools.ProfileJobs <gate> [sfDir] [runs]
  */
object ProfileJobs {

  final case class JobRec(id: Int, t0: Long, var t1: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, desc: String)

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q76_pagerank")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("PROFILE_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROFILE_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional session-conf overrides for A/B runs in ONE JVM:
    // PROFILE_EXTRA_CONF="k=v;k=v"
    sys.env.get("PROFILE_EXTRA_CONF").foreach(_.split(';').filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
        System.err.println(s"[jobs] conf $k=$v")
      })
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId,
          JobRec(e.jobId, e.time, stages = e.stageInfos.size,
            tasks = e.stageInfos.map(_.numTasks).sum, desc = d.take(60)))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId); if (r != null) r.t1 = e.time
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to runs) {
      jobs.clear()
      val t0 = System.currentTimeMillis()
      val n = fn(spark, sfDir).count()
      val t1 = System.currentTimeMillis()
      graft.ops.Pins.releaseAll(spark)
      // let listener events drain before reading (bus is private API;
      // a short sleep is enough for a dev tool)
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val rs = jobs.values.asScala.toSeq.sortBy(_.t0)
      val jobMs = rs.map(r => math.max(0L, r.t1 - r.t0)).sum
      println(f"[jobs] run $i $name: total ${(t1 - t0) / 1e3}%.3f s, " +
        f"$n rows, ${rs.size} jobs, job-time ${jobMs / 1e3}%.3f s, " +
        f"gaps ${(t1 - t0 - jobMs) / 1e3}%.3f s")
      if (i == runs) {
        var prevEnd = t0
        rs.foreach { r =>
          val gap = r.t0 - prevEnd
          println(f"[jobs]   gap ${gap / 1e3}%6.3f s | job ${r.id}%3d " +
            f"${(r.t1 - r.t0) / 1e3}%6.3f s stages=${r.stages}%2d " +
            f"tasks=${r.tasks}%4d ${r.desc}")
          prevEnd = math.max(prevEnd, r.t1)
        }
        println(f"[jobs]   tail gap ${(t1 - prevEnd) / 1e3}%.3f s")
      }
      Console.out.flush()
    }
    spark.stop()
  }
}
