package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The north-rule leakage audit: clean as-of output passes; a planted
  * future-sourced row is caught with its lead time. */
class LeakageAuditSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join output audits clean; a planted leak is caught") {
    val build = Seq(("e0", 5L, 1.0), ("e0", 15L, 2.0), ("e1", 8L, 3.0))
      .toDF("entity", "ts", "v")
    val probes = Seq(("e0", 10L), ("e0", 20L), ("e1", 4L)).toDF("entity", "ts")
    val joined = AsOfJoin.asOf(probes, build, "entity", "ts", Seq("v"), bucketWidth = 8L)

    assert(LeakageAudit.audit(joined, "ts", AsOfJoin.SrcTs).count() == 0L)
    val stats = LeakageAudit.auditStats(joined, "ts", AsOfJoin.SrcTs).head()
    assert(stats.getLong(0) == 3L) // n_rows
    assert(stats.getLong(1) == 2L) // n_matched (e1@4 has no past build row)
    assert(stats.getLong(2) == 0L) // n_leaked
    assert(stats.isNullAt(3)) // max_lead

    // plant a leak: a row whose source ts post-dates its as-of ts by 7
    val dirty = joined.unionByName(
      Seq(("e9", 100L, 107L, 9.9)).toDF("entity", "ts", AsOfJoin.SrcTs, "v"))
    val caught = LeakageAudit.audit(dirty, "ts", AsOfJoin.SrcTs).collect()
    assert(caught.length == 1 && caught.head.getAs[String]("entity") == "e9")
    val dirtyStats = LeakageAudit.auditStats(dirty, "ts", AsOfJoin.SrcTs).head()
    assert(dirtyStats.getLong(2) == 1L)
    assert(dirtyStats.getLong(3) == 7L)
  }
}
