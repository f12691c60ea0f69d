package graft

import org.apache.spark.sql.functions._

/** Skew evidence for the north rule's hot-phash-cluster scenario: one
  * entity holds most rows. The naive as-of plan (per-entity window ⇒ one
  * task owns the hot entity) is reproduced by calling the SAME operator
  * with a bucket width wider than the ts span (1 bucket/entity); the
  * production width spreads the hot entity over span/width tasks. Results
  * land in BASELINE.md.
  *
  * Two metrics per plan:
  *  - wall seconds — the end-to-end win, but contention-SENSITIVE: the
  *    naive plan uses ~1 core, so background host load barely touches it,
  *    while the bucketed plan wants every core; under heavy external load
  *    the wall ratio can invert even though the plans haven't changed;
  *  - max single-task seconds — the skew signal itself (how big is the
  *    biggest task each plan schedules), contention-ROBUST: load factors
  *    hit both plans' tasks alike, and the naive plan's hot task stays
  *    ~(span/width)× larger no matter the host weather.
  *
  * Run: `runMain graft.SkewBench [hotRows] [coldEntities] [cpus] [json]` —
  * with `json`, one rep per plan and machine-readable `SKEWJSON {...}`
  * lines, a partial one after the bucketed run (Bench parses the LAST line,
  * so a timeout-killed child still reports the production number — same
  * partial-evidence principle as ScaleChild).
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val hotRows = if (args.length > 0) args(0).toInt else 400000
    val coldEntities = if (args.length > 1) args(1).toInt else 31
    val cpus = if (args.length > 2) args(2).toInt else 32
    val jsonMode = args.contains("json")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // max task duration of the jobs run since the last reset (listener bus
    // is async — reads happen after a short drain sleep)
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong
    val debug = sys.env.contains("SPARK_GRAFT_SKEW_DEBUG")
    val stageMax = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = if (t.taskInfo != null) t.taskInfo.duration else 0L
        var cur = maxTaskMs.get()
        while (d > cur && !maxTaskMs.compareAndSet(cur, d)) cur = maxTaskMs.get()
        if (debug) stageMax.merge(t.stageId, d, math.max(_, _))
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (debug) {
          val si = sc.stageInfo
          System.err.println(
            s"[skewdbg] stage ${si.stageId} tasks=${si.numTasks} " +
              s"maxTaskMs=${stageMax.getOrDefault(si.stageId, -1L)} ${si.name.take(80)}")
        }
    })

    val span = 1000000L
    val coldRows = hotRows / 50
    // hot entity: 80%+ of all rows, dense over the span; cold: sparse
    def side(seed: Long) = {
      val hot = spark.range(hotRows).select(
        lit("hot").as("entity"),
        (col("id") * span / hotRows + seed % 17).as("ts"),
        (col("id") % 1000).cast("double").as("v"))
      val cold = spark.range(coldEntities.toLong * coldRows).select(
        concat(lit("c"), (col("id") % coldEntities)).as("entity"),
        (col("id") * span / (coldEntities.toLong * coldRows) + seed % 13).as("ts"),
        (col("id") % 997).cast("double").as("v"))
      hot.unionByName(cold)
    }
    val build = side(3L).cache()
    val probes = side(7L).withColumnRenamed("v", "pv").cache()
    val total = build.count() + probes.count()

    /** (best wall sec, best-rep max task sec) for one plan width; max task
      * is reset PER REP so a cold rep-1's JIT-inflated tasks cannot leak
      * into the reported signal — both metrics are best-of-reps. */
    def run(name: String, width: Long): (Double, Double) = {
      val reps = if (jsonMode) 1 else 2
      val measured = (1 to reps).map { rep =>
        Thread.sleep(300) // drain listener events from previous jobs
        maxTaskMs.set(0L)
        val t0 = System.nanoTime()
        val n = ops.AsOfJoin
          .asOf(probes, build, "entity", "ts", Seq("v"), width)
          .agg(count(lit(1)), sum(col("v"))).head()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let this rep's task-end events land
        if (!jsonMode)
          println(f"SKEW $name rep$rep width=$width rows=$total sec=$sec%.2f check=$n")
        (sec, maxTaskMs.get() / 1000.0)
      }
      (measured.map(_._1).min, measured.map(_._2).min)
    }

    // untimed warm-up of BOTH plan widths in json mode (each over a 1/8
    // data slice — the post-shuffle stages codegen identically to the full
    // plan, so both single-rep measurements start compile-warm; warming
    // only one width would hand its plan a systematic advantage). The
    // interactive mode's rep pairs absorb this via best-of-2 instead.
    if (jsonMode) {
      val pSlice = probes.where(col("ts") % 8 === 0)
      val bSlice = build.where(col("ts") % 8 === 0)
      Seq(span / (cpus * 8), span * 10).foreach { w =>
        ops.AsOfJoin.asOf(pSlice, bSlice, "entity", "ts", Seq("v"), w)
          .agg(count(lit(1))).head()
      }
    }
    // bucketed (fast) FIRST so a timeout-killed child has already reported
    // the production plan's numbers via the partial line below
    val (bucketed, bucketedMaxTask) = run("bucketed", span / (cpus * 8))
    if (jsonMode) {
      println(f"""SKEWJSON {"rows":$total,"bucketed_max_task_sec":$bucketedMaxTask%.2f,"bucketed_sec":$bucketed%.2f}""")
      System.out.flush()
    }
    val (naive, naiveMaxTask) = run("naive_1_bucket", span * 10) // whole entity in one task
    // max_task_ratio LEADS (round-3 directive #3): it is the
    // contention-robust skew signal — how big a task each plan schedules —
    // while the wall pair can invert under host load (the naive plan uses
    // ~1 core, the bucketed plan wants all of them).
    if (jsonMode)
      println(
        f"""SKEWJSON {"rows":$total,"max_task_ratio":${naiveMaxTask / math.max(bucketedMaxTask, 0.001)}%.1f,""" +
          f""""naive_max_task_sec":$naiveMaxTask%.2f,"bucketed_max_task_sec":$bucketedMaxTask%.2f,""" +
          f""""naive_sec":$naive%.2f,"bucketed_sec":$bucketed%.2f,""" +
          f""""speedup":${naive / bucketed}%.2f}""")
    else
      println(f"SKEW max_task naive=$naiveMaxTask%.2f s bucketed=$bucketedMaxTask%.2f s ratio=${naiveMaxTask / math.max(bucketedMaxTask, 0.001)}%.1f")
    spark.stop()
  }
}
