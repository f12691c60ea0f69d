package graft

/** Run driver queries standalone: args = name[,name...] sfDir [cpus]
  * [explain]. Prints wall seconds + row count per query (and optionally the
  * formatted plan) — the per-query tuning loop without the full Bench
  * sweep. A comma-separated list runs in ONE session, in order — the way to
  * measure queries that share session-staged state (minhashPairGraph). */
object QueryOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = org.apache.spark.sql.SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(s"graft-q1-${names.head}")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (args.contains("explain")) fn(spark, sfDir).explain("formatted")
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"QUERYONE $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
