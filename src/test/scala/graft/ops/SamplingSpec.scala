package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  test("hash split is total, deterministic, and repartition-invariant") {
    val ids = spark.range(2000).toDF("id")
    def assign(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), Sampling.assignSplit(
        col("id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = assign(ids)
    val b = assign(ids.repartition(7)) // physical layout must not matter
    assert(a == b)
    assert(a.values.forall(Set("train", "val", "test")), "every row gets exactly one split")
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05 && math.abs(frac("val") - 0.1) < 0.03)
  }

  test("sampleByHash keeps a stable subset at ~rate") {
    val ids = spark.range(5000).toDF("id")
    val kept = Sampling.sampleByHash(ids, "id", 0.2).collect().map(_.getLong(0)).toSet
    val kept2 = Sampling.sampleByHash(ids.repartition(13), "id", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(kept == kept2, "sample must be key-stable, not layout-dependent")
    assert(math.abs(kept.size / 5000.0 - 0.2) < 0.03)
    // monotone: a bigger rate strictly extends the sample (nested splits)
    val kept5 = Sampling.sampleByHash(ids, "id", 0.5).collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(kept5), "samples at increasing rates must nest")
  }

  test("assignSplit covers every bucket even with non-representable thirds") {
    // per-fraction rounding would yield 3x3333 = 9999 and strand bucket
    // 9999 with a null split; cumulative quantization must be gap-free
    val ids = spark.range(30000).toDF("id")
    val nulls = ids.select(Sampling.assignSplit(
        col("id"), Seq("a" -> (1.0 / 3), "b" -> (1.0 / 3), "c" -> (1.0 / 3))).as("s"))
      .where(col("s").isNull).count()
    assert(nulls == 0L, "every bucket must belong to exactly one split")
  }
}
