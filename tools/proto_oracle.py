#!/usr/bin/env python3
"""Prototype Phase C oracle SQL against DuckDB (syntax + result sanity)."""
import duckdb

con = duckdb.connect()
sf = "/root/testdata/sf0.01"
for t in ["documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

SH = """
  SELECT doc_id, CASE WHEN len(tk) < 3 THEN [] ELSE
    list_distinct([concat_ws(' ', tk[i], tk[i+1], tk[i+2]) for i in range(1, len(tk) - 1)])
    END AS shs
  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk FROM documents)
"""

qs = {
"q_dedup_exact": """
SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY text
""",
"q_minhash_sig": f"""
WITH sh AS ({SH}),
e AS (SELECT doc_id, unnest(shs) AS s FROM sh),
m AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || s)) AS mh
      FROM e, (SELECT unnest(range(0, 16)) AS seed) GROUP BY doc_id, seed)
SELECT doc_id, list(mh ORDER BY seed) AS sig FROM m GROUP BY doc_id
""",
"q_minhash_lsh": f"""
WITH sh AS ({SH}),
e AS (SELECT doc_id, unnest(shs) AS s FROM sh),
m AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || s)) AS mh
      FROM e, (SELECT unnest(range(0, 16)) AS seed) GROUP BY doc_id, seed),
sig AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM m GROUP BY doc_id),
band AS (SELECT doc_id, b, md5(array_to_string(list_slice(sig, b*4 + 1, b*4 + 4), '|')) AS bh
         FROM sig, (SELECT unnest(range(0, 4)) AS b)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM band a JOIN band b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
  round(len(list_intersect(x.shs, y.shs))::DOUBLE /
        (len(x.shs) + len(y.shs) - len(list_intersect(x.shs, y.shs))), 4) AS jaccard
FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b
WHERE len(list_intersect(x.shs, y.shs))::DOUBLE /
      (len(x.shs) + len(y.shs) - len(list_intersect(x.shs, y.shs))) >= 0.5
""",
"q_ngram_jaccard": f"""
WITH sh AS ({SH})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  round(len(list_intersect(a.shs, b.shs))::DOUBLE /
        (len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs))), 4) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.shs, b.shs)) > 0
  AND len(list_intersect(a.shs, b.shs))::DOUBLE /
      (len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs))) >= 0.5
""",
"q_simhash": """
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t FROM documents),
th AS (
  SELECT doc_id, t,
    list_sum([(strpos('0123456789abcdef', substr(md5(t), j, 1)) - 1)::BIGINT << (4*(12 - j))
              for j in range(1, 13)]) AS h
  FROM tok),
bits AS (
  SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th, (SELECT unnest(range(0, 48)) AS i) GROUP BY doc_id, i)
SELECT doc_id, bit_or(CASE WHEN s > 0 THEN 1::BIGINT << i ELSE 0::BIGINT END) AS simhash
FROM bits GROUP BY doc_id
""",
"q_cosine_near_dup": """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.45
""",
"q_ann_topk": """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id % 50 = 0),
s AS (SELECT q.query_id, e.vec_id AS nn_id,
        round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cos
      FROM embeddings e, q WHERE e.vec_id <> q.query_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, nn_id) AS rank FROM s)
SELECT query_id, rank, nn_id, round(cos, 4) AS cos FROM r WHERE rank <= 5
""",
"q_lang_id": """
WITH h AS (
  SELECT doc_id,
    len([t for t in tk if t IN ('the','a','of','and','is')]) AS hits_en,
    len([t for t in tk if t IN ('der','die','das','und','ist')]) AS hits_de,
    len([t for t in tk if t IN ('el','la','los','de','es')]) AS hits_es,
    len([t for t in tk if t IN ('le','la','les','et','est')]) AS hits_fr,
    len([t for t in tk if t IN ('的','是','了','在','我')]) AS hits_zh
  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk FROM documents))
SELECT doc_id, hits_en, hits_de, hits_es, hits_fr, hits_zh,
  CASE WHEN greatest(hits_en, hits_de, hits_es, hits_fr, hits_zh) = 0 THEN 'und'
       WHEN hits_en = greatest(hits_en, hits_de, hits_es, hits_fr, hits_zh) THEN 'en'
       WHEN hits_de = greatest(hits_de, hits_es, hits_fr, hits_zh) THEN 'de'
       WHEN hits_es = greatest(hits_es, hits_fr, hits_zh) THEN 'es'
       WHEN hits_fr = greatest(hits_fr, hits_zh) THEN 'fr'
       ELSE 'zh' END AS pred_lang
FROM h
""",
"q_token_count": """
SELECT doc_id,
  len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_ws_tokens,
  len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_word_tokens
FROM documents
""",
"q_quality": """
WITH b AS (
  SELECT doc_id,
    len(regexp_split_to_array(lower(trim(text)), '\\s+'))::DOUBLE AS n_tok,
    length(lower(text))::DOUBLE AS n_char,
    (length(lower(text)) - length(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g')))::DOUBLE AS punct,
    len([t for t in regexp_split_to_array(lower(trim(text)), '\\s+')
         if t IN ('the','a','of','and','is')])::DOUBLE AS stop
  FROM documents)
SELECT doc_id, n_tok::BIGINT AS n_tokens,
  round(punct / n_char, 4) AS punct_ratio,
  round(stop / n_tok, 4) AS stopword_ratio,
  round(
    (CASE WHEN n_char >= 50 AND n_char <= 10000 THEN 1.0 ELSE 0.5 END) * 0.3 +
    (CASE WHEN (n_char - (n_tok - 1)) / n_tok >= 2 AND (n_char - (n_tok - 1)) / n_tok <= 12
          THEN 1.0 ELSE 0.5 END) * 0.2 +
    (1.0 - least(punct / n_char * 5, 1.0)) * 0.25 +
    least(stop / n_tok * 4, 1.0) * 0.25, 4) AS quality
FROM b
""",
"q_fingerprint": """
WITH sh AS (
  SELECT doc_id, CASE WHEN len(tk) < 8 THEN [] ELSE
    [concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4], tk[i+5], tk[i+6], tk[i+7])
     for i in range(1, len(tk) - 6)] END AS shs
  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk FROM documents))
SELECT doc_id, list_min([md5(s) for s in shs]) AS fingerprint FROM sh
""",
}

for name, sql in qs.items():
    try:
        r = con.execute(sql).fetch_arrow_table()
        print(f"OK   {name}: {r.num_rows} rows  sample={r.to_pylist()[0] if r.num_rows else None}")
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:300]}")
