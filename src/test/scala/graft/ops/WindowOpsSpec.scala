package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WindowOpsSpec extends SparkSpec {
  import spark.implicits._

  // dense frames with a gap: e1 has ts 0..9 then 40..44 (gap of 30)
  private def frames = ((0 until 10) ++ (40 until 45)).map(t => ("e1", t.toLong, t.toDouble))
    .toDF("entity", "ts", "v")

  test("sessionize: gap > threshold starts new session") {
    val out = Sessionize
      .sessionize(frames, "entity", "ts", gap = 5L)
      .select($"ts", $"session_id")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert((0 until 10).forall(t => out(t.toLong) == 1L))
    assert((40 until 45).forall(t => out(t.toLong) == 2L))
  }

  test("locf fills only forward, never backward") {
    val df = Seq(
      ("e1", 0L, null.asInstanceOf[java.lang.Double]),
      ("e1", 1L, java.lang.Double.valueOf(5.0)),
      ("e1", 2L, null.asInstanceOf[java.lang.Double]),
      ("e1", 3L, java.lang.Double.valueOf(7.0)),
      ("e1", 4L, null.asInstanceOf[java.lang.Double]))
      .toDF("entity", "ts", "c")
    for (bucketed <- Seq(false, true)) {
      val out = (if (bucketed) Backfill.locfBucketed(df, "entity", "ts", "c", 2L)
                 else Backfill.locf(df, "entity", "ts", Seq("c")))
        .select($"ts", $"c_filled")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      assert(out(0L).isEmpty, s"bucketed=$bucketed: must not backfill")
      assert(out(1L).contains(5.0) && out(2L).contains(5.0))
      assert(out(3L).contains(7.0) && out(4L).contains(7.0))
    }
  }

  test("tumbling ceil keeps partial tail, floor drops it (A2 vs A3)") {
    // 13 rows, window size 5 -> buckets of 5,5,3
    val df = (0 until 13).map(t => ("e1", t.toLong, 1.0)).toDF("entity", "ts", "v")
    val ceil = Windows.tumblingAgg(df, "entity", "ts", 5L, Windows.CeilTail,
      Seq(avg($"v").as("m"))).count()
    val floor = Windows.tumblingAgg(df, "entity", "ts", 5L, Windows.FloorTail,
      Seq(avg($"v").as("m"))).count()
    assert(ceil == 3L && floor == 2L)
  }

  test("uniformSubsample picks round(linspace) ranks like UniformTemporalSubsample") {
    // n=10, k=4 -> ranks round(0,3,6,9) = 0,3,6,9
    val df = (0 until 10).map(t => ("e1", 0L, t.toLong)).toDF("entity", "g", "ts")
    val kept = Windows.uniformSubsample(df, "entity", "g", "ts", 4)
      .select($"ts").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 3L, 6L, 9L))
  }

  test("lag/lead delta and TSM shift zero-pad boundaries") {
    val out = LagLead.withLagLead(frames, "entity", "ts", "v")
      .where($"ts" === 0L).select($"v_lag1", $"v_delta1").head()
    assert(out.isNullAt(0) && out.isNullAt(1))
    val vecs = (0 until 3).map(t => ("e1", t.toLong, Seq.tabulate(6)(i => (t * 10 + i).toDouble)))
      .toDF("entity", "ts", "vec")
    val shifted = LagLead.tsmShift(vecs, "entity", "ts", "vec", dim = 6, shiftDiv = 2)
      .select($"ts", $"vec_tsm").collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // t=1: lead block from t=2 (20,21), lag block from t=0 (2,3), keep own (14,15)
    assert(shifted(1L) == Seq(20.0, 21.0, 2.0, 3.0, 14.0, 15.0))
    // t=0: lag side zero-padded; t=2: lead side zero-padded
    assert(shifted(0L) == Seq(10.0, 11.0, 0.0, 0.0, 4.0, 5.0))
    assert(shifted(2L) == Seq(0.0, 0.0, 12.0, 13.0, 24.0, 25.0))
  }

  test("trailing mean over 3 preceding + current") {
    val out = Windows.trailingMean(frames, "entity", "ts", "v", 3, "m")
      .where($"ts" === 5L).select($"m").head().getDouble(0)
    assert(out == (2.0 + 3.0 + 4.0 + 5.0) / 4)
  }

  test("uniformSubsample plans ONE Window operator (shared spec, r8)") {
    val df = (0 until 100).map(t => ("e" + t % 3, t % 5, t.toLong)).toDF("entity", "g", "ts")
    val plan = Windows.uniformSubsample(df, "entity", "g", "ts", 4)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size == 1, s"want one fused Window node, got ${windows.size}")
  }
}
