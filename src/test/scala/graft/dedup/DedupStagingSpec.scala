package graft.dedup

import java.nio.file.Files

import graft.SparkSpec

/** Round-4 directive #4: the pluggable staging hook. [[Dedup.localStage]]
  * (block-manager localCheckpoint — single-node default) and
  * [[Dedup.parquetStage]] (temp-parquet write/read — the 100 TB path where
  * the staged shingle relation cannot live in block-manager memory) must be
  * observationally identical: same operators, same staged relations, only
  * the materialization medium differs. Asserted on the driver's own
  * documents table so the parity covers exactly what the oracle checks.
  */
class DedupStagingSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("minhashLsh: parquet staging is result-identical to localCheckpoint") {
    val dir = Files.createTempDirectory("graft_stage_mh").toString
    val local = canon(Dedup.minhashLsh(docs, "doc_id", "text"))
    val parquet = canon(
      Dedup.minhashLsh(docs, "doc_id", "text", stage = Dedup.parquetStage(dir)))
    assert(parquet == local)
    assert(local.nonEmpty, "fixture must produce near-dup pairs")
  }

  test("ngramJaccard: parquet staging is result-identical to localCheckpoint") {
    val dir = Files.createTempDirectory("graft_stage_ng").toString
    val local = canon(Dedup.ngramJaccard(docs, "doc_id", "text"))
    val parquet = canon(
      Dedup.ngramJaccard(docs, "doc_id", "text", stage = Dedup.parquetStage(dir)))
    assert(parquet == local)
    assert(local.nonEmpty, "fixture must produce near-dup pairs")
  }
}
