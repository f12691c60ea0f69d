package graft.feats

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VecOpsSpec extends SparkSpec {
  import spark.implicits._

  test("vecAvg equals element-wise arithmetic mean") {
    val data = Seq(
      (1, Seq(1.0, 2.0, 3.0)),
      (1, Seq(3.0, 2.0, 1.0)),
      (2, Seq(10.0, 0.0, -10.0)))
    val out = data
      .toDF("g", "vec")
      .groupBy($"g")
      .agg(VecOps.vecAvg($"vec").as("m"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
      .toMap
    assert(out(1) == Seq(2.0, 2.0, 2.0))
    assert(out(2) == Seq(10.0, 0.0, -10.0))
  }

  test("vecAvg partial/merge law: mean invariant under partition split") {
    val vecs = (0 until 100).map(i => Seq(i.toDouble, (i * 7 % 13).toDouble))
    val expect = Seq(vecs.map(_.head).sum / 100, vecs.map(_(1)).sum / 100)
    for (parts <- Seq(1, 3, 8)) {
      val got = spark.sparkContext
        .parallelize(vecs, parts)
        .toDF("vec")
        .agg(VecOps.vecAvg($"vec"))
        .head()
        .getSeq[Double](0)
      assert(got.zip(expect).forall { case (a, b) => math.abs(a - b) < 1e-12 },
        s"parts=$parts: $got != $expect")
    }
  }

  test("dot / cosine / l2 against scalar math") {
    val df = Seq((Seq(1.0, 2.0, 2.0), Seq(2.0, 0.0, 1.0))).toDF("a", "b")
    val r = df
      .select(
        VecOps.dot($"a", $"b").as("d"),
        VecOps.l2Norm($"a").as("na"),
        VecOps.cosine($"a", $"b").as("c"))
      .head()
    assert(r.getDouble(0) == 4.0)
    assert(r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 4.0 / (3.0 * math.sqrt(5.0))) < 1e-12)
  }

  test("cosine three ways is bit-identical: column algebra == UDF == native expression") {
    // deterministic pseudo-random vectors incl. a zero vector and a ragged pair
    val rows = (0 until 200).map { i =>
      def h(k: Int) = ((i * 2654435761L + k * 40503L) % 997L).toDouble / 499.0 - 1.0
      (Seq.tabulate(24)(h), Seq.tabulate(if (i % 7 == 0) 20 else 24)(k => h(k + 100)))
    } :+ ((Seq.fill(24)(0.0), Seq.fill(24)(1.0)))
    val out = rows
      .toDF("a", "b")
      .select(
        VecOps.cosine($"a", $"b").as("alg"),
        VecOps.cosineUdf($"a", $"b").as("udf"),
        VecOps.cosineFast($"a", $"b").as("fast"))
      .collect()
    // ragged pairs included: UDF and native share the common-prefix contract
    out.foreach { r =>
      val vals = (0 until 3).map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i)))
      assert(vals(1) == vals(2), s"udf vs native differ: $vals")
    }
    // equal-length subset: all three identical (zip_with/aggregate is only
    // defined for equal lengths)
    val eq = rows.filter { case (a, b) => a.length == b.length }
    val out2 = eq
      .toDF("a", "b")
      .select(
        VecOps.cosine($"a", $"b").as("alg"),
        VecOps.cosineUdf($"a", $"b").as("udf"),
        VecOps.cosineFast($"a", $"b").as("fast"))
      .collect()
    out2.foreach { r =>
      val vals = (0 until 3).map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i)))
      assert(vals(0) == vals(1) && vals(1) == vals(2), s"three-way mismatch: $vals")
    }
  }

  test("psnr: identical vectors -> +inf, known mse -> exact dB") {
    val df = Seq((Seq(0.5, 0.5), Seq(0.5, 0.5), Seq(0.5, 0.6))).toDF("a", "b", "c")
    val r = df.select(VecOps.psnr($"a", $"b"), VecOps.psnr($"a", $"c")).head()
    assert(r.getDouble(0).isPosInfinity)
    val mse = 0.1 * 0.1 / 2
    assert(math.abs(r.getDouble(1) - 10 * math.log10(1 / mse)) < 1e-9)
  }
}
