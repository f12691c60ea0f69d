package graft
import org.apache.spark.sql.functions._

/** Microbenchmark: Scala-UDF cosine vs the native codegen'd CosineSim
  * expression on ~1M broadcast-join pairs (dim 64). Reproduces the 4.5×
  * number cited in graft.plans.CosineSim's scaladoc; sums must print
  * bit-identical across variants. */
object CosBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.feats.VecOps
    def emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
      .repartition(8)
    def pairs = emb.crossJoin(broadcast(emb.limit(500).select(col("id").as("id2"), col("v").as("v2"))))
    def time(name: String)(c: => org.apache.spark.sql.Column): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = pairs.select(c.as("cos")).agg(sum(col("cos"))).head()
        println(f"COS $name rep$i sec=${(System.nanoTime()-t0)/1e9}%.2f $n")
      }
    time("warmup")(VecOps.cosineFast(col("v"), col("v2")))
    time("udf")(VecOps.cosineUdf(col("v"), col("v2")))
    time("fast")(VecOps.cosineFast(col("v"), col("v2")))
    time("udf2")(VecOps.cosineUdf(col("v"), col("v2")))
    spark.stop()
  }
}
