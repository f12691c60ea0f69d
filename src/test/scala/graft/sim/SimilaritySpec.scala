package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.synth.SynthImages

/** annLsh recall vs the exact bruteTopK baseline, measured — an approximate
  * operator with no measured recall is unverified (round-1 gap).
  *
  * The corpus is the workload sign-LSH is built for: clustered embeddings
  * (near-dup phash clusters, north rule) — 60 clusters × 5 members, members
  * = center + small deterministic noise, so each query's true top-4 are its
  * cluster mates at cosine ≈ 1. Recall is asserted at a hard floor; exact
  * determinism is asserted by running the operator twice.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val Clusters = 60
  private val PerCluster = 5
  private val Dim = 32
  private val K = 4 // = cluster mates per query

  /** deterministic uniform in [-1, 1) from the engine's splitmix. */
  private def u(a: Long, b: Long, c: Long): Double =
    (SynthImages.mix(a, b, c) % 100000L) / 50000.0 - 1.0

  private val corpus = {
    val rows = for {
      cl <- 0 until Clusters
      m <- 0 until PerCluster
    } yield {
      val id = (cl * PerCluster + m).toLong
      val vec = (0 until Dim).map { d =>
        u(cl.toLong, d.toLong, 7L) + 0.05 * u(id, d.toLong, 11L)
      }
      (id, vec)
    }
    rows.toDF("vec_id", "embedding")
  }

  // one query per cluster: the first member
  private val queries = corpus.where($"vec_id" % PerCluster === 0)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"query_id", $"nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("annLsh recall@4 >= 0.9 vs bruteTopK on clustered embeddings") {
    val brute = pairs(
      Similarity.bruteTopK(corpus, queries, "vec_id", "embedding", "vec_id", "embedding", K))
    val ann = pairs(
      Similarity.annLsh(corpus, queries, "vec_id", "embedding", "vec_id", "embedding", K))
    assert(brute.size == Clusters * K)
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.9, s"annLsh recall@$K = $recall < 0.9 (16 tables x 6 bits)")
  }

  test("annLsh is deterministic and never emits self-matches or rank > k") {
    val run1 = Similarity.annLsh(corpus, queries, "vec_id", "embedding", "vec_id", "embedding", K)
    val run2 = Similarity.annLsh(corpus, queries, "vec_id", "embedding", "vec_id", "embedding", K)
    val r1 = run1.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val r2 = run2.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(r1 == r2, "annLsh must be deterministic (hyperplanes derived from seed)")
    assert(r1.nonEmpty)
    run1.collect().foreach { r =>
      assert(r.getAs[Long]("query_id") != r.getAs[Long]("nn_id"), "self-match")
      assert(r.getAs[Int]("rank") <= K)
    }
  }
}
