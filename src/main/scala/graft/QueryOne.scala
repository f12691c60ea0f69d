package graft

/** Run ONE driver query standalone: args = name sfDir [cpus] [explain].
  * Prints wall seconds + row count (and optionally the formatted plan) —
  * the per-query tuning loop without the full Bench sweep. */
object QueryOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = org.apache.spark.sql.SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(s"graft-q1-$name")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (args.contains("explain")) fn(spark, sfDir).explain("formatted")
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    println(f"QUERYONE $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
