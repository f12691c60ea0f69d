package graft

import org.apache.spark.sql.functions._

/** Dump the EXECUTED plan of the bench flagship kernel
  * (`Bench.consumeChunks`-shaped): args = [fixturePath] [cpus].
  * Counts decode-UDF project instances — the no-reuse diamond detector. */
object FlagPlan {
  def main(args: Array[String]): Unit = {
    val path =
      if (args.length > 0) args(0) else s"/tmp/graft_bench_images_128x1024_c${Bench.NChunks}"
    val cpus = if (args.length > 1) args(1).toInt else 8
    val spark = Bench.session(cpus)
    val df = graft.pipeline.FeaturePipeline
      .frameFeatures(spark.read.parquet(path).where(col("__chunk") === 0))
    // toRdd.count() on THIS Dataset's QueryExecution finalizes its
    // adaptive plan (an agg-count would finalize a separate Dataset's plan
    // and just run the expensive pipeline twice — see Bucketed.exchangeCount)
    val qe = df.queryExecution
    qe.toRdd.count()
    val plan = qe.executedPlan.toString
    println(plan)
    val udfs = "UDF\\(bytes".r.findAllIn(plan).size
    println(s"FLAGPLAN decode_udf_sites=$udfs")
    spark.stop()
  }
}
