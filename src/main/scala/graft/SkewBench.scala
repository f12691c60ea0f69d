package graft

import org.apache.spark.sql.functions._

/** Skew evidence for the north rule's hot-phash-cluster scenario: one
  * entity holds most rows. The naive as-of plan (per-entity window ⇒ one
  * task owns the hot entity) is reproduced by calling the SAME operator
  * with a bucket width wider than the ts span (1 bucket/entity); the
  * production width spreads the hot entity over span/width tasks. Results
  * land in BASELINE.md.
  *
  * Run: `runMain graft.SkewBench [hotRows] [coldEntities] [cpus] [json]` —
  * with `json`, one rep per plan and a single machine-readable
  * `SKEWJSON {...}` line (Bench folds it into the contract line so the
  * north rule's explicit-skew-handling claim is driver-visible).
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
    import spark.implicits._

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

    def run(name: String, width: Long): Double = {
      val reps = if (jsonMode) 1 else 2
      (1 to reps).map { rep =>
        val t0 = System.nanoTime()
        val n = ops.AsOfJoin
          .asOf(probes, build, "entity", "ts", Seq("v"), width)
          .agg(count(lit(1)), sum(col("v"))).head()
        val sec = (System.nanoTime() - t0) / 1e9
        if (!jsonMode)
          println(f"SKEW $name rep$rep width=$width rows=$total sec=$sec%.2f check=$n")
        sec
      }.min
    }
    val naive = run("naive_1_bucket", span * 10) // whole entity in one task = naive window plan
    val bucketed = run("bucketed", span / (cpus * 8)) // production: ~256 tasks for the hot entity
    if (jsonMode)
      println(f"""SKEWJSON {"rows":$total,"naive_sec":$naive%.2f,"bucketed_sec":$bucketed%.2f,"speedup":${naive / bucketed}%.2f}""")
    spark.stop()
  }
}
