package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, sum, xxhash64, struct,
  to_json}

/** Execution-strategy invariance sweep: run EVERY gate twice on the SAME
  * data — once under the committed session configuration, once under a
  * perturbed execution strategy — and compare an order-insensitive
  * fingerprint of each result. The board's answers must not depend on HOW
  * Spark executed the plan; on a 1000-executor cluster every knob below
  * varies outside the engine's control (cluster defaults, AQE decisions,
  * input split sizing, codegen fallbacks under memory pressure), so any
  * gate whose OUTPUT shifts with them is a silent-wrong-answer bug of the
  * classic distributed class: float partial-agg order, `first()` without a
  * total order, ranking ties broken by partition layout, codegen vs
  * interpreted expression divergence.
  *
  * This probes empirically what the repo claims structurally:
  *  - exact scaled-integer aggregation ⇒ partial-agg order can't matter;
  *  - every ranking window orders by a documented total order;
  *  - every native kernel's eval() matches its doGenCode()
  *    (KernelParitySpec pins them pairwise; `nocodegen` runs the WHOLE
  *    BOARD interpreted);
  *  - join-strategy choice (broadcast vs shuffle) is a cost decision,
  *    never a semantics one.
  *
  * Modes (each an independent perturbation; `all` runs every one):
  *  - `layout`   — inputs rewritten as 13 round-robin parquet parts per
  *                 table (different file count/order ⇒ different scan
  *                 split and partial-agg accumulation order) AND
  *                 `spark.sql.shuffle.partitions=7` (every exchange,
  *                 window bucket, and state-store partitioning changes).
  *  - `nocodegen`— whole-stage codegen off + expression factory forced to
  *                 NO_CODEGEN: every native expression runs its
  *                 interpreted eval() path board-wide.
  *  - `noaqe`    — adaptive execution off: static shuffle plans, no
  *                 runtime coalescing/skew-splitting/join demotion.
  *  - `nobroadcast` — autoBroadcastJoinThreshold=-1: every UNHINTED join
  *                 falls back to shuffle strategy (the round-15 un-hinted
  *                 dim joins must produce identical rows either way).
  *
  * Fingerprint: sum over rows of xxhash64(all columns) as DECIMAL(38,0)
  * (order-insensitive, bit-exact on doubles), plus row count and schema.
  * Falls back to xxhash64(to_json(struct(*))) for any column type the
  * hash expression rejects. A DIFF is a finding; a gate that REFUSES must
  * refuse identically (same exception class) under every strategy.
  *
  * Usage: InvarianceSweep <sfDir> <mode|all|none> [gateSubstring]
  * Prints one MATCH/DIFF/ERR line per (mode, gate) and a summary; exits
  * nonzero on any DIFF. `none` runs baseline only, printing one BASE
  * fingerprint line per gate (hash, rows, schema tag) — the cross-JVM
  * form: diff the BASE lines of two processes; exits nonzero if any gate
  * REFUSES on the committed corpus (a scripted probe checking only exit
  * status must not read an OOM-refusing board as a pass). Env knobs for
  * the cross-JVM probes (all recorded in
  * PLANS.md "Scale-fidelity probes"):
  *   SPARK_DRIVER_MEM=800m      starved-heap memory-pressure run
  *   PROFILE_MASTER=local-cluster[2,8,2048]  real executor JVMs
  *   GRAFT_JARS=<packaged jar>  ship classes to local-cluster executors
  *   GRAFT_SPECULATION=1        aggressive speculative task clones
  *                              (needs local-cluster: local[n] never
  *                              starts the speculation thread)
  *   GRAFT_LOGLEVEL=INFO        see the "as speculatable" evidence
  *   (local-cluster also needs SPARK_HOME and SPARK_SCALA_VERSION=2.13
  *   exported so ExecutorRunner can build the executor command)
  */
object InvarianceSweep {

  /** Per-mode session-conf deltas (applied to a fresh `newSession`). */
  val modeConfs: Map[String, Seq[(String, String)]] = Map(
    "layout" -> Seq(
      "spark.sql.shuffle.partitions" -> "7",
      "spark.sql.files.maxPartitionBytes" -> "262144",
      "spark.sql.files.openCostInBytes" -> "0"),
    "nocodegen" -> Seq(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN"),
    "noaqe" -> Seq(
      "spark.sql.adaptive.enabled" -> "false"),
    "nobroadcast" -> Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"))

  val modeOrder: Seq[String] = Seq("layout", "nocodegen", "noaqe",
    "nobroadcast")

  /** Copy every table as `parts` round-robin parquet parts — same rows,
    * different file count, file order, and row order within files. The
    * `layout` mode's input side: a scan of the copy accumulates partial
    * aggregates in a different order than the single-file original, which
    * is exactly the variation a real cluster's block placement produces.
    */
  def writeRepartitionedTables(spark: SparkSession, srcDir: String,
      outDir: String, parts: Int = 13): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.Tables.all.foreach { t =>
      spark.read.parquet(s"$srcDir/$t.parquet").repartition(parts)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }

  /** Order-insensitive result fingerprint: (Σ xxhash64(row) as
    * decimal(38,0), row count, schema.simpleString). Bit-exact — a
    * last-ulp double shift under a different partial-agg order IS a
    * mismatch, which is the point: the exact-arithmetic discipline claims
    * none exists.
    */
  def fingerprint(df: DataFrame): (String, Long, String) = {
    val h =
      try {
        val c = xxhash64(df.columns.map(col).toIndexedSeq: _*)
        df.select(c.as("h")) // force analysis so unsupported types throw here
          .queryExecution.analyzed
        c
      } catch { case _: Throwable => xxhash64(to_json(struct(col("*")))) }
    val row = df.select(
      sum(h.cast("decimal(38,0)")).as("s"), count(lit(1)).as("n")).head()
    val s = Option(row.get(0)).map(_.toString).getOrElse("0")
    (s, row.getLong(1), df.schema.simpleString)
  }

  /** First 12 hex chars of md5 — compact, JVM-stable schema tag for the
    * greppable BASE lines.
    */
  def md5_12(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString

  /** Run one gate to a comparable outcome: Right(fingerprint) or
    * Left(exception class simple name — refusals must be strategy-
    * invariant too).
    */
  def outcome(spark: SparkSession, dir: String,
      fn: (SparkSession, String) => DataFrame)
      : Either[String, (String, Long, String)] =
    try Right(fingerprint(fn(spark, dir)))
    catch { case e: Throwable => Left(e.getClass.getSimpleName) }
    finally graft.ops.Pins.releaseAll(spark)

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val modeArg = if (args.length > 1) args(1) else "all"
    val only = if (args.length > 2) args(2) else ""
    // `none` = baseline only: print per-gate fingerprints and exit. The
    // cross-JVM form of the probe — run once under the committed 24g heap
    // and once under a starved one (SPARK_DRIVER_MEM=2g, PROFILE_MASTER=
    // local[8]), then diff the BASE lines: memory pressure must change
    // SPILL BEHAVIOR, never answers, and nothing on the board may OOM.
    val modes =
      if (modeArg == "all") modeOrder
      else if (modeArg == "none") Seq.empty
      else { require(modeConfs.contains(modeArg), s"unknown mode $modeArg")
        Seq(modeArg) }
    // GRAFT_SPECULATION=1: launch speculative duplicates of nearly every
    // task (quantile 0.05, multiplier 1.0, 10 ms checks) — the local
    // analog of straggler re-execution on a real cluster. Core confs, so
    // they must be set at context construction (not per-session); the
    // cross-JVM BASE-line diff against a normal run then verifies that
    // duplicate tasks never change a result or double-commit a write.
    val speculate = sys.env.get("GRAFT_SPECULATION").contains("1")
    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("PROFILE_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (speculate) {
      // every gate-sized task is eligible: no min-runtime floor, clone at
      // 1.0x the median, and the 3.4+ "efficiency" heuristic (which
      // suppresses clones of tasks processing at near-median rate — i.e.
      // all of them on an idle host) off. Verified live: INFO logs show
      // "Marking task N ... as speculatable" across the board.
      builder.config("spark.speculation", "true")
        .config("spark.speculation.interval", "10ms")
        .config("spark.speculation.multiplier", "1.0")
        .config("spark.speculation.quantile", "0.05")
        .config("spark.speculation.minTaskRuntime", "0ms")
        .config("spark.speculation.efficiency.enabled", "false")
    }
    // GRAFT_JARS: ship the packaged graft jar to executors — required for
    // PROFILE_MASTER=local-cluster[n,cores,memMB], the only local master
    // with REAL executor JVMs (separate heaps, serialized closures and
    // broadcasts, remote shuffle fetches) and the only one whose scheduler
    // runs the speculation thread at all (TaskSchedulerImpl guards it with
    // !isLocal, so GRAFT_SPECULATION under plain local[n] is vacuous).
    sys.env.get("GRAFT_JARS").foreach(j => builder.config("spark.jars", j))
    val spark = builder.getOrCreate()
    // INFO shows "Marking task N ... as speculatable" lines — the proof
    // the GRAFT_SPECULATION probe actually launched clones, not a vacuous
    // pass (grep the run log for 'speculat')
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("GRAFT_LOGLEVEL", "ERROR"))

    val gates = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.contains(only))

    println(s"== baseline (committed confs) on $srcDir: ${gates.size} gates")
    val t0 = System.nanoTime()
    val base: Map[String, Either[String, (String, Long, String)]] =
      gates.map { case (name, fn) =>
        val o = outcome(spark, srcDir, fn)
        // one greppable fingerprint line per gate — diffable across JVMs
        // (the `none` memory-pressure form runs baseline in two heaps).
        // The schema rides along hashed (md5/12): a cross-JVM probe whose
        // perturbation changed a result TYPE but not its row hash/count
        // must still diff on the BASE lines (round-15 advice).
        o match {
          case Right((s, n, sch)) =>
            println(s"BASE  $name $s $n ${md5_12(sch)}")
          case Left(err) => println(s"BASE  $name REFUSED $err")
        }
        name -> o }.toMap
    val baseRefusals = base.values.count(_.isLeft)
    println(f"baseline done in ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"($baseRefusals refusals)")
    // `none` (cross-JVM BASE) mode: the committed corpus runs all gates
    // green, so ANY baseline refusal here is a finding (a starved-heap or
    // multi-JVM probe scripting only the exit status must not read an
    // OOM-refusing board as a pass — round-15 advice)
    if (modes.isEmpty && baseRefusals > 0) {
      println(s"FAIL: $baseRefusals baseline refusals in `none` mode")
      spark.stop()
      sys.exit(1)
    }

    val layoutDir: String =
      if (modes.contains("layout")) {
        val d = java.nio.file.Files
          .createTempDirectory("graft_inv_layout").toString
        writeRepartitionedTables(spark, srcDir, d)
        d
      } else ""

    var diffs = 0
    try modes.foreach { m =>
      val sess = spark.newSession()
      modeConfs(m).foreach { case (k, v) => sess.conf.set(k, v) }
      val dir = if (m == "layout") layoutDir else srcDir
      println(s"== mode $m")
      val tm = System.nanoTime()
      gates.foreach { case (name, fn) =>
        val got = outcome(sess, dir, fn)
        (base(name), got) match {
          case (b, g) if b == g => println(s"MATCH $m $name")
          case (Left(b), Left(g)) =>
            diffs += 1; println(s"DIFF  $m $name: refusal class $b vs $g")
          case (Left(b), Right(g)) =>
            diffs += 1; println(s"DIFF  $m $name: baseline refused ($b), " +
              s"mode returned ${g._2} rows")
          case (Right(b), Left(g)) =>
            diffs += 1; println(s"DIFF  $m $name: baseline returned " +
              s"${b._2} rows, mode refused ($g)")
          case (Right(b), Right(g)) =>
            diffs += 1
            val what =
              if (b._3 != g._3) s"schema ${b._3} vs ${g._3}"
              else if (b._2 != g._2) s"rows ${b._2} vs ${g._2}"
              else s"hash ${b._1} vs ${g._1} (same rows/schema)"
            println(s"DIFF  $m $name: $what")
        }
      }
      println(f"mode $m done in ${(System.nanoTime() - tm) / 1e9}%.1f s")
    } finally if (layoutDir.nonEmpty)
      // the layout copy is a full parquet replica of every table (at the
      // sweep's sf) — leaking one per run fills the disk (round-15 advice)
      graft.io.TempDirs.deleteRecursively(layoutDir)
    println(s"done: ${gates.size} gates x ${modes.size} modes, $diffs diffs")
    spark.streams.active.foreach { st =>
      try st.stop() catch { case _: Throwable => () } }
    try org.apache.spark.sql.graft.GraftBridge.stopStateStore()
    catch { case _: Throwable => () }
    spark.stop()
    if (diffs > 0) sys.exit(1)
  }
}
