package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark (driver contract): ONE JSON line with
  *  - per-query wall seconds over $SPARK_GRAFT_SF_DIR at local[$SPARK_GRAFT_CPUS]
  *  - the headline north-rule metric: feature rows/sec of the flagship image
  *    pipeline (decode → window features → as-of join), measured at BOTH
  *    local[8] and local[32] on identical input, with scaling efficiency
  *    (rps_32 / rps_8) / 4 — the N→4N evidence BASELINE.md calls for.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Flagship throughput at a given parallelism: frame-feature rows/sec of
    * the full pipeline (decode UDF + LOCF + lag + session + per-second agg)
    * reading the SAME pre-materialized parquet input table at every level —
    * generation is not part of the measured job. */
  private def flagshipRps(cpus: Int, inputPath: String): (Long, Double) = {
    val spark = session(cpus)
    try {
      // warm-up (JIT + codegen caches) on a small slice, not timed
      graft.pipeline.FeaturePipeline
        .frameFeatures(spark.read.parquet(inputPath).limit(2000)).count()
      val t0 = System.nanoTime()
      val rows = graft.pipeline.FeaturePipeline
        .frameFeatures(spark.read.parquet(inputPath))
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      (rows, rows / sec)
    } finally spark.stop()
  }

  /** Materialize the synthetic image table once (untimed input fixture). */
  private def materialize(entities: Int, frames: Int): String = {
    val path = s"/tmp/graft_bench_images_${entities}x$frames"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) {
      val spark = session(8)
      try graft.synth.SynthImages.table(spark, entities, frames)
        .repartition(64) // enough input splits to feed 32 threads
        .write.mode("overwrite").parquet(path)
      finally spark.stop()
    }
    path
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val benchEntities = sys.env.getOrElse("SPARK_GRAFT_BENCH_ENTITIES", "64").toInt
    val benchFrames = sys.env.getOrElse("SPARK_GRAFT_BENCH_FRAMES", "1024").toInt

    // 1. per-query timings (driver contract)
    val spark = session(cpus.toInt)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()

    // 2. scaling evidence: same input, N=8 vs 4N=32 threads
    val inputPath = materialize(benchEntities, benchFrames)
    val (rows8, rps8) = flagshipRps(8, inputPath)
    val (rows32, rps32) = flagshipRps(32, inputPath)
    require(rows8 == rows32, "scaling runs must see identical input")
    val eff = (rps32 / rps8) / 4.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scaling =
      f"""{"rows":$rows8,"rps_8":$rps8%.1f,"rps_32":$rps32%.1f,"efficiency":$eff%.3f}"""
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","feature_rows_per_sec":${f"$rps32%.1f"},"scaling":$scaling}""")
  }
}
