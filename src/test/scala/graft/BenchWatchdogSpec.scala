package graft

import org.apache.spark.sql.functions._

/** Fault-injection spec for the bench loop's per-query watchdog (round-6
  * directive #1: q_tfidf ran 466 s — 518× its quiet reference — as an
  * uncancellable blocking count() and starved 7 queries plus the cpu
  * control out of the artifact). A runaway query must now cost its cap
  * plus a bounded cancellation grace, never the artifact. The end-to-end
  * variant of this fault (a sleeping query injected into the real bench
  * loop) is exercised via SPARK_GRAFT_BENCH_FAULT_SLEEP_SEC — see
  * BASELINE.md round-7 validation runs. */
class BenchWatchdogSpec extends SparkSpec {

  test("a runaway query is cancelled at its cap and costs bounded wall time") {
    // every task sleeps 180 s — unguarded this query takes ≥ 180 s.
    // escalate = false: suites share one session and may run concurrently,
    // so the test must stay inside its own job group (the bench JVM runs
    // the full escalation — it is sole-tenant there).
    // The sleep lives in a FILTER, not a projected column: count() over a
    // projected UDF is prunable (the repo's documented pitfall — even an
    // asNondeterministic project got collapsed away when the full suite
    // ran in parallel, and this test observed a 0.2 s RunOk). A filter
    // condition is always evaluated, under every optimizer path.
    val slp = udf((_: Long) => { Thread.sleep(180 * 1000L); true }).asNondeterministic()
    val t0 = System.nanoTime()
    val (sec, status) = Bench.runGuarded(spark, "zz_sleep_test", 5L, escalate = false) {
      spark.range(0, 8, 1, 8).where(slp(col("id"))).count(): Unit
    }
    val wall = (System.nanoTime() - t0) / 1e9
    assert(status == Bench.RunCancelled, s"expected cancellation, got $status after ${sec}s")
    // cap 5 s + interrupt-on-cancel grace; generous bound so concurrent
    // suites on a loaded host can't flake it — still ≪ the 180 s unguarded
    assert(wall < 90, s"cancellation must be bounded: took ${wall}s")
  }

  test("a healthy query passes through the watchdog untouched") {
    val (sec, status) = Bench.runGuarded(spark, "zz_ok_test", 120L) {
      spark.range(1000).selectExpr("sum(id)").head(): Unit
    }
    assert(status == Bench.RunOk, s"expected ok, got $status")
    assert(sec < 120)
  }

  test("a genuinely failing query reports failure, not cancellation") {
    val (_, status) = Bench.runGuarded(spark, "zz_fail_test", 120L) {
      spark.read.parquet("/nonexistent/graft/path").count(): Unit
    }
    assert(status.isInstanceOf[Bench.RunFailed], s"expected failure, got $status")
  }
}
