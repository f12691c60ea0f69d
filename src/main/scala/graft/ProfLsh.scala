package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for minhashLsh stage costs (temporary). */
object ProfLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name sec=${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    val n = t("docs.count")(docs.count())
    println(s"PROF ndocs=$n")
    val stats = t("textlen")(docs.agg(avg(length(col("text"))), max(length(col("text")))).head())
    println(s"PROF avglen=${stats.get(0)} maxlen=${stats.get(1)}")
    val base = t("base.checkpoint")(
      graft.dedup.Dedup.shingleDf(docs, "doc_id", "text", 3).localCheckpoint())
    t("base.count")(base.count())
    val sig = t("sig")(base.select(col("doc"), explode(col("sh")).as("s"))
      .groupBy("doc").agg(min(md5(col("s"))).as("m")).count())
    val full = t("full.minhashLsh")(
      graft.dedup.Dedup.minhashLsh(docs, "doc_id", "text").count())
    println(s"PROF pairs=$full sig=$sig")
    spark.stop()
  }
}
