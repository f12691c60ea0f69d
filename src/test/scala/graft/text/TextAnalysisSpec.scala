package graft.text

import graft.SparkSpec

/** TF-IDF law checks (the rest of TextAnalysis is hash-checked against the
  * DuckDB oracle at sf0.01 — q_lang_id / q_quality / q_token_count /
  * q_fingerprint / q_tfidf). */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf matches the smooth-idf formula on a hand-computed corpus") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidf(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // N = 2; idf(a) = ln(3/3)+1 = 1; idf(b) = idf(c) = ln(3/2)+1 = 1.4055
    assert(got((1L, "a")) == ((2L, 2L, 2.0)))
    assert(got((1L, "b")) == ((1L, 1L, 1.4055)))
    assert(got((2L, "a")) == ((1L, 2L, 1.0)))
    assert(got((2L, "c")) == ((1L, 1L, 1.4055)))
    assert(got.size == 4)
  }

  test("tfidf document frequency counts documents, not occurrences") {
    // "a" appears 3 times in one doc — df must still be 1
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidf(docs, "doc_id", "text")
      .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(got("a") == 1L && got("b") == 1L)
  }
}
