package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-query job profiler (optimization-round tooling, NOT part of the
  * frozen bench contract): runs driver queries exactly like the bench loop
  * (same session shape, same count() action, same between-query persisted-
  * block hygiene) and prints one line per Spark job — wall ms and job
  * description — so a query's cost decomposes into its eager staging jobs
  * vs the final count, and wall − sum(jobs) exposes driver-side
  * planning/codegen time.
  *
  * args: name[,name...] [sfDir] [cpus] [reps]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val reps = if (args.length > 3) args(3).toInt else 1
    val spark = org.apache.spark.sql.SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(s"graft-prof-${names.head}")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class JobRec(start: Long, var end: Long = -1L, desc: String)
    val jobs = TrieMap.empty[Int, JobRec]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs(js.jobId) = JobRec(
          js.time,
          desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse(""))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.get(je.jobId).foreach(_.end = je.time)
    })

    // session warm-up exactly like Bench.main
    try {
      spark.range(100000).selectExpr("sum(id)").head()
      spark.read.parquet(s"$sfDir/nation.parquet").count()
    } catch { case _: Throwable => () }

    (1 to reps).foreach { rep =>
      names.foreach { name =>
        jobs.clear()
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        // wait for listener events to drain
        Thread.sleep(200)
        println(f"PROFILE $name rep=$rep rows=$n sec=$sec%.3f jobs=${jobs.size}")
        jobs.toSeq.sortBy(_._1).foreach { case (id, r) =>
          val ms = if (r.end > 0) r.end - r.start else -1L
          println(f"  job=$id%-4d ms=$ms%-7d ${r.desc.take(110)}")
        }
        // same between-query persisted-block hygiene as the bench loop
        // (Bench.afterQuery): memo-protection must hold under it
        val protectedIds = SparkEntry.pairGraphStagedIds(spark, sfDir)
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!protectedIds.contains(id)) rdd.unpersist(blocking = false)
        }
      }
    }
    spark.stop()
  }
}
