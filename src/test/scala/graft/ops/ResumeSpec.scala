package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.FeaturePipeline
import graft.synth.SynthImages

/** North-rule resumability: run → "kill" after k partitions → re-run →
  * identical output + manifest lineage, completed partitions not recomputed
  * (reference semantics: skip-if-exists `segment_feature_extractor.py:47-49`,
  * completed-set diff `video_batch.py:8-10`). */
class ResumeSpec extends SparkSpec {
  import spark.implicits._

  private def features = FeaturePipeline
    .frameFeatures(SynthImages.table(spark, entities = 6, framesPerEntity = 64))
    .select($"entity", $"ts", $"vec")

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_resume_$tag"
    val p = Paths.get(d)
    if (Files.exists(p)) {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(d)).deleteRecursively()
    }
    d
  }

  test("kill/re-run converges to the uninterrupted result with intact lineage") {
    // uninterrupted reference run
    val refDir = freshDir("ref")
    val n1 = Resume.processPending(spark, features, "entity", "ts", "vec", refDir, snapshotId = 1L)
    assert(n1 == 6L)

    // interrupted run: only 2 partitions complete before the "kill"
    val dir = freshDir("killed")
    val k1 = Resume.processPending(spark, features, "entity", "ts", "vec", dir, 1L, maxPartitions = 2)
    assert(k1 == 2L)
    val manifestAfterKill = Resume.readManifest(spark, dir)
      .select($"partition", $"featureDigest").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(manifestAfterKill.size == 2)

    // resume: picks up ONLY the remaining 4
    val k2 = Resume.processPending(spark, features, "entity", "ts", "vec", dir, 2L)
    assert(k2 == 4L)
    // idempotent: a third run finds nothing pending
    assert(Resume.processPending(spark, features, "entity", "ts", "vec", dir, 3L) == 0L)

    // completed partitions kept their original manifest rows (not recomputed)
    val finalManifest = Resume.readManifest(spark, dir)
    assert(finalManifest.count() == 6L)
    manifestAfterKill.foreach { case (p, d) =>
      val row = finalManifest.where($"partition" === p).head()
      assert(row.getLong(row.fieldIndex("featureDigest")) == d)
      assert(row.getLong(row.fieldIndex("snapshotId")) == 1L, "must not be re-stamped")
    }

    // final data identical to the uninterrupted run
    def slurp(d: String) = spark.read.parquet(s"$d/data")
      .select($"entity", $"ts", to_json(graft.feats.VecOps.vecRound($"vec".cast("array<double>"), 4)))
      .collect().map(_.toSeq).toSet
    assert(slurp(dir) == slurp(refDir))

    // lineage audit healthy on both
    assert(Resume.audit(spark, dir, "entity", "ts", "vec").count() == 0L)
    assert(Resume.audit(spark, refDir, "entity", "ts", "vec").count() == 0L)
  }

  test("a crashed attempt's orphan partition data is replaced, not doubled") {
    val dir = freshDir("orphan")
    // simulate a prior attempt that wrote data but died before the manifest
    features.where($"entity" === "e0000")
      .withColumn("__part", $"entity")
      .write.mode("append").partitionBy("__part").parquet(s"$dir/data")
    Resume.processPending(spark, features, "entity", "ts", "vec", dir, 1L)
    val cleanCount = features.where($"entity" === "e0000").count()
    val m = Resume.readManifest(spark, dir)
    val row = m.where($"partition" === "e0000").head()
    assert(row.getLong(row.fieldIndex("rowCount")) == cleanCount, "orphan rows doubled into manifest")
    assert(spark.read.parquet(s"$dir/data").where($"entity" === "e0000").count() == cleanCount)
    assert(Resume.audit(spark, dir, "entity", "ts", "vec").count() == 0L)
  }

  test("readAsOf time-travels to a snapshot's partition set") {
    val dir = freshDir("timetravel")
    Resume.processPending(spark, features, "entity", "ts", "vec", dir, 1L, maxPartitions = 2)
    Resume.processPending(spark, features, "entity", "ts", "vec", dir, 2L)
    val manifest = Resume.readManifest(spark, dir).collect()
    val snap1Rows = manifest.filter(_.getAs[Long]("snapshotId") == 1L).map(_.getAs[Long]("rowCount")).sum
    val allRows = manifest.map(_.getAs[Long]("rowCount")).sum
    assert(Resume.readAsOf(spark, dir, 1L).count() == snap1Rows)
    assert(Resume.readAsOf(spark, dir, 2L).count() == allRows)
    // as-of-1 sees exactly the 2 partitions committed by snapshot 1
    val p1 = Resume.readAsOf(spark, dir, 1L).select($"entity").distinct().count()
    assert(p1 == 2L)
  }

  test("1000+ partitions route through the semi-join path with exact stats") {
    // Past 1000 pending partitions BOTH the work filter and the manifest
    // read-back switch from a literal In-list to a broadcast left-semi
    // join (round-3 advice: the read-back previously rebuilt the In-list,
    // re-creating the analyzed-plan bloat the work filter avoids). 1003
    // single-row partitions with ZERO-PADDED string keys also re-prove the
    // inference-free read end to end at this width.
    val dir = freshDir("wide")
    val wide = spark
      .range(1003)
      .select(
        format_string("p%04d", $"id").as("entity"),
        ($"id" % 7).as("ts"),
        array(($"id" % 13).cast("double")).as("vec"))
    val n = Resume.processPending(spark, wide, "entity", "ts", "vec", dir, 1L)
    assert(n == 1003L)
    val m = Resume.readManifest(spark, dir)
    assert(m.count() == 1003L)
    // every manifest row carries real read-back stats (a broken prune
    // would record rowCount = 0) and the audit recomputation agrees
    assert(m.where($"rowCount" =!= 1L).count() == 0L)
    assert(Resume.audit(spark, dir, "entity", "ts", "vec").count() == 0L)
    // idempotence: nothing pending on re-run
    assert(Resume.processPending(spark, wide, "entity", "ts", "vec", dir, 2L) == 0L)
  }

  test("audit flags a tampered partition") {
    val dir = freshDir("tamper")
    Resume.processPending(spark, features, "entity", "ts", "vec", dir, 1L)
    // tamper: delete one partition's data directory
    import scala.reflect.io.Directory
    val victim = new java.io.File(s"$dir/data/__part=e0000")
    assert(victim.exists())
    new Directory(victim).deleteRecursively()
    val bad = Resume.audit(spark, dir, "entity", "ts", "vec")
    assert(bad.count() == 1L)
    assert(bad.head().getString(0) == "e0000")
  }

  test("writer salt adapts to volume: 1 file/partition small, capped fan-out hot (r8)") {
    import scala.jdk.CollectionConverters._
    def dataFiles(out: String, part: String): Seq[java.nio.file.Path] = {
      val d = Paths.get(s"$out/data/__part=$part")
      Files.list(d).iterator().asScala.filter(_.toString.endsWith(".parquet")).toSeq
    }
    val small = freshDir("salt_small")
    Resume.processPending(spark, features, "entity", "ts", "vec", small, 1L)
    val parts = Files.list(Paths.get(s"$small/data")).iterator().asScala
      .filter(_.getFileName.toString.startsWith("__part=")).toSeq
    assert(parts.nonEmpty)
    parts.foreach { d =>
      val n = Files.list(d).iterator().asScala.count(_.toString.endsWith(".parquet"))
      assert(n == 1, s"small-volume partition $d wrote $n files, want 1")
    }
    // force the hot path: tiny rows-per-writer budget -> fan-out >1, <=8.
    // AQE's partition coalescing merges the salted shuffle back to one
    // task at this volume (exactly what we want in production for small
    // partitions) — disable it so the salt's fan-out is observable. The
    // override lives on a CLONED session (same r7-advice pattern as
    // BucketedWindowsSpec): suites share one SparkSession concurrently, so
    // the session-global flip could flake a sibling's plan assertions.
    // (graft.resume.rowsPerWriter is JVM-global, but Resume is exercised
    // only by this suite, whose tests run sequentially.)
    sys.props("graft.resume.rowsPerWriter") = "10"
    val session2 = spark.newSession()
    session2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val hot = freshDir("salt_hot")
      val feats2 = graft.pipeline.FeaturePipeline
        .frameFeatures(SynthImages.table(session2, entities = 6, framesPerEntity = 64))
        .select(col("entity"), col("ts"), col("vec"))
      Resume.processPending(session2, feats2, "entity", "ts", "vec", hot, 1L)
      val counts = Files.list(Paths.get(s"$hot/data")).iterator().asScala
        .filter(_.getFileName.toString.startsWith("__part="))
        .map(d => Files.list(d).iterator().asScala.count(_.toString.endsWith(".parquet")))
        .toSeq
      assert(counts.exists(_ > 1), s"hot path never fanned out: $counts")
      assert(counts.forall(_ <= 8), s"fan-out exceeded the 8-writer ceiling: $counts")
      // layout change must not change the audit result
      val bad = Resume.audit(spark, hot, "entity", "ts", "vec").count()
      assert(bad == 0L, "audit must stay clean under salted layout")
    } finally sys.props.remove("graft.resume.rowsPerWriter")
  }
}
