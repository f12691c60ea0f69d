package graft

/** spark-submit smoke: proves the jar + `--conf spark.sql.extensions=
  * graft.plans.GraftExtensions` path end to end — the injected native
  * function must be planned from SQL text. Prints one SUBMITCHECK line. */
object SubmitCheck {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = spark
      .sql("SELECT cosine_sim(array(1.0D, 2.0D, 2.0D), array(2.0D, 0.0D, 1.0D)) AS c")
      .head()
      .getDouble(0)
    val want = 4.0 / (3.0 * math.sqrt(5.0))
    println(s"SUBMITCHECK cosine_sim=$r expected=$want match=${r == want}")
    spark.stop()
  }
}
