package graft

import org.apache.spark.sql.SparkSession

/** Local smoke: drives SparkEntry.entry exactly like the driver does. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"entry rows=$n schema=${df.schema.simpleString}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
