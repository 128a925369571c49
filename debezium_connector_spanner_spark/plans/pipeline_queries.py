"""Training-data-pipeline queries (dedup / similarity / text analysis /
multimodal) + DuckDB oracles where SQL can express the same computation.

Hash parity trick: every content hash used in a checked query is built
from md5 (available in both engines). The 60-bit integer form
(`md5_hash64`) is reproduced in DuckDB by folding the first 15 hex chars:
each nibble via strpos on a hex alphabet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_connector_spanner_spark.functions.dedup import (
    jaccard_pairs_exact,
    minhash_lsh_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from debezium_connector_spanner_spark.functions.multimodal import (
    extract_features,
    frame_sample_plan,
    synth_media,
)
from debezium_connector_spanner_spark.functions.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
)
from debezium_connector_spanner_spark.functions.text import quality_features


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ------------------------------------------------------------------ dedup
def q_docs_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_df=100 exercises the quadratic-blowup guard (shingles in >100
    docs are dropped before the self-join); the oracle applies the same cap."""
    d = _t(spark, sf_dir, "documents")
    return jaccard_pairs_exact(d, "doc_id", "text", n=3, threshold=0.8, max_df=100)


# DuckDB: same inverted-index join, optionally with the same max_df cap
def sql_docs_jaccard(max_df: int | None = None) -> str:
    cap = (
        f"WHERE sh NOT IN (SELECT sh FROM inv0 GROUP BY sh HAVING count(*) > {max_df})"
        if max_df is not None
        else ""
    )
    return rf"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []
              ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(w) >= 3
           THEN [array_to_string(w[i+1:i+3], ' ') for i in range(len(w) - 2)]
           ELSE [] END) AS shingles
  FROM toks
),
inv0 AS (
  SELECT doc_id, len(shingles) AS set_size, unnest(shingles) AS sh
  FROM sh
),
inv AS (SELECT * FROM inv0 {cap}),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.set_size AS size_a, b.set_size AS size_b,
         count(*) AS n_common
  FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1,2,3,4
)
SELECT doc_a, doc_b,
       round(n_common / (size_a + size_b - n_common), 6) AS jaccard
FROM pairs
WHERE n_common / (size_a + size_b - n_common) >= 0.8
"""


def q_docs_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified. Same oracle as the
    exact jaccard query: at 128 hashes / 32 bands the false-negative
    probability at j>=0.8 is < 1e-7, and every candidate is re-verified
    exactly, so the result should equal the exact pair set."""
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", n=3, num_hashes=128, bands=32, threshold=0.8)


def q_docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return simhash_fingerprints(d, "doc_id", "text")


# DuckDB reproduces md5_hash64 (conv(substring(md5(t),1,15),16,10)) with a
# hex-nibble shift-fold, then the SimHash bit vote: bit b set iff strictly
# more token hashes have bit b set than clear. Hashes are 60-bit so bits
# 60-63 never set and the BIGINT never goes negative.
_SQL_TOKEN_HASH = (
    "CAST(list_sum(list_transform(range(15), i -> "
    "CAST(strpos('0123456789abcdef', md5(t)[CAST(i + 1 AS INTEGER)]) - 1 AS BIGINT) "
    "<< CAST(4 * (14 - i) AS BIGINT))) AS BIGINT)"
)

SQL_DOCS_SIMHASH_FP = rf"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []
              ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS w
  FROM documents
),
hashed AS (
  SELECT doc_id, list_transform(w, t -> {_SQL_TOKEN_HASH}) AS hs
  FROM toks
)
SELECT doc_id,
  CASE WHEN len(hs) = 0 THEN 0 ELSE
    CAST(coalesce(list_sum(list_transform(range(60), b ->
      CASE WHEN 2 * len(list_filter(hs, h -> ((h >> CAST(b AS BIGINT)) & 1) = 1)) > len(hs)
           THEN CAST(1 AS BIGINT) << CAST(b AS BIGINT) ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT)
  END AS simhash64
FROM hashed
"""

SQL_DOCS_SIMHASH_NEAR = (
    "WITH fp AS (" + SQL_DOCS_SIMHASH_FP + ")\n"
    "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,\n"
    "       CAST(bit_count(xor(a.simhash64, b.simhash64)) AS BIGINT) AS hamming\n"
    "FROM fp a JOIN fp b ON a.doc_id < b.doc_id\n"
    "WHERE bit_count(xor(a.simhash64, b.simhash64)) <= 3\n"
)


def q_docs_simhash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-LSH near pairs; equals the brute-force hamming<=3 pair set
    (pigeonhole: <=3 differing bits over 4 blocks => >=1 identical block),
    which is what the DuckDB oracle computes."""
    d = _t(spark, sf_dir, "documents")
    out = simhash_near_pairs(d, "doc_id", "text", max_hamming=3)
    return out.withColumn("hamming", F.col("hamming").cast("long"))


def q_docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return quality_features(d).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("digit_ratio", 6).alias("digit_ratio"),
        F.round("stopword_ratio_en", 6).alias("stopword_ratio_en"),
    )


SQL_DOCS_QUALITY = r"""
WITH toks AS (
  SELECT doc_id, text,
         CASE WHEN length(trim(text)) = 0 THEN []
              ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS w
  FROM documents
)
SELECT doc_id,
  len(w) AS n_tokens,
  round(CASE WHEN len(w) > 0
        THEN list_sum(list_transform(w, x -> length(x)))::DOUBLE / len(w)
        ELSE 0.0 END, 6) AS mean_word_len,
  round(CASE WHEN length(text) > 0
        THEN length(regexp_replace(text, '[^.!?,;:]', '', 'g'))::DOUBLE / length(text)
        ELSE 0.0 END, 6) AS punct_ratio,
  round(CASE WHEN length(text) > 0
        THEN length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE / length(text)
        ELSE 0.0 END, 6) AS digit_ratio,
  round(CASE WHEN len(w) > 0
        THEN len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x)))::DOUBLE / len(w)
        ELSE 0.0 END, 6) AS stopword_ratio_en
FROM toks
"""


def q_docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (winnowing-lite): min rolling hash over
    64-char windows of the normalized text — robust to local edits, so
    shared fingerprints flag near-identical documents. All JVM-side
    (sequence+transform+array_min inside codegen); the DuckDB oracle
    replays the identical window/hash pipeline."""
    from debezium_connector_spanner_spark.functions.text import rolling_fingerprint

    from debezium_connector_spanner_spark.functions.text import (
        ensure_min_parallelism,
    )

    d = ensure_min_parallelism(_t(spark, sf_dir, "documents"))
    # normalize ONCE in a materialized projection: inlined, the
    # lower(trim(...)) sits inside the window-transform lambda and Spark
    # re-evaluates it per window (no HOF loop-invariant hoisting) —
    # O(len^2) per doc; hoisted, one pass. Same values, same oracle.
    norm = d.select("doc_id", F.lower(F.trim(F.col("text"))).alias("_t"))
    n_pos = F.greatest(F.length("_t") - 63, F.lit(1))
    return norm.select(
        "doc_id",
        rolling_fingerprint(
            F.col("_t"), window=64, stride=4, normalized=True
        ).alias("fingerprint"),
        (((n_pos - 1) / 4).cast("long") + 1).alias("n_windows"),
    )


def q_docs_fingerprint_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-cluster dedup view: fingerprints shared by >1 doc with
    the member count and the keeper (min doc_id) — the dedup decision a
    pipeline would apply downstream of docs_fingerprint."""
    fp = q_docs_fingerprint(spark, sf_dir)
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .where(F.col("n_docs") > 1)
    )


# min rolling hash over 64-char windows; i is the (1-based) window start,
# j the md5 hex nibble being folded into the 60-bit integer
_SQL_WIN_HASH = (
    "CAST(list_sum(list_transform(range(15), j -> "
    "CAST(strpos('0123456789abcdef', "
    "md5(substring(t, CAST(i AS INTEGER), 64))[CAST(j + 1 AS INTEGER)]) - 1 AS BIGINT) "
    "<< CAST(4 * (14 - j) AS BIGINT))) AS BIGINT)"
)

SQL_DOCS_FINGERPRINT = f"""
WITH c AS (SELECT doc_id, lower(trim(text)) AS t FROM documents)
SELECT doc_id,
  list_min(list_transform(
           range(1, CAST(greatest(length(t) - 63, 1) AS INTEGER) + 1, 4),
           i -> {_SQL_WIN_HASH})) AS fingerprint,
  CAST((greatest(length(t) - 63, 1) - 1) // 4 + 1 AS BIGINT) AS n_windows
FROM c
"""

SQL_DOCS_FINGERPRINT_DUPS = (
    "WITH fp AS (" + SQL_DOCS_FINGERPRINT + ")\n"
    "SELECT fingerprint, CAST(count(*) AS BIGINT) AS n_docs,\n"
    "       min(doc_id) AS keep_doc_id\n"
    "FROM fp GROUP BY fingerprint HAVING count(*) > 1\n"
)


def q_docs_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: argmax stopword-hit-rate across candidate
    languages; 'und' when nothing matches."""
    from debezium_connector_spanner_spark.functions.text import STOPWORDS, words

    d = _t(spark, sf_dir, "documents")
    # hoist the token array: inlined it is re-evaluated once per
    # candidate language's score struct (4x tokenization per row)
    d = d.withColumn("_w", words(F.col("text")))
    w = F.col("_w")
    scores = []
    for lang, sw in sorted(STOPWORDS.items()):
        arr = F.array(*[F.lit(x) for x in sw])
        scores.append(
            F.struct(
                F.size(F.filter(w, lambda t: F.array_contains(arr, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # max by (hits, lang) — deterministic tie-break on lang code
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["hits"].cast("long").alias("stopword_hits"),
    )


def _sql_lang_score(lang: str, sw: list[str]) -> str:
    # sortable "hits|lang" encoding: DuckDB greatest() lacks struct
    # support, but zero-padded-varchar max orders identically to Spark's
    # greatest(struct(hits, lang)) incl. the tie-break on lang code
    arr = ", ".join(f"'{x}'" for x in sw)
    return (
        "printf('%06d|%s', len(list_filter(w, x -> list_contains(["
        + arr
        + f"], x))), '{lang}')"
    )


def sql_docs_langid() -> str:
    from debezium_connector_spanner_spark.functions.text import STOPWORDS

    scores = [_sql_lang_score(lang, sw) for lang, sw in sorted(STOPWORDS.items())]
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         CASE WHEN length(trim(text)) = 0 THEN []
              ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS w
  FROM documents
),
scored AS (
  SELECT doc_id, lang, greatest({', '.join(scores)}) AS best
  FROM toks
)
SELECT doc_id, lang AS lang_label,
       CASE WHEN CAST(split_part(best, '|', 1) AS BIGINT) > 0
            THEN split_part(best, '|', 2) ELSE 'und' END AS lang_pred,
       CAST(split_part(best, '|', 1) AS BIGINT) AS stopword_hits
FROM scored
"""


# -------------------------------------------------------------- similarity
def q_emb_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    out = cosine_topk_bruteforce(emb, queries, k=10)
    return out.withColumn("rank", F.col("rank").cast("long"))


SQL_EMB_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS nbr_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, nbr_id,
    round(
      CASE WHEN sqrt(list_sum(list_transform(cv, x -> (x::DOUBLE)*(x::DOUBLE)))) > 0
            AND sqrt(list_sum(list_transform(qv, x -> (x::DOUBLE)*(x::DOUBLE)))) > 0
      THEN list_sum(list_transform(range(len(cv)), i -> cv[i+1]::DOUBLE * qv[i+1]::DOUBLE))
           / (sqrt(list_sum(list_transform(cv, x -> (x::DOUBLE)*(x::DOUBLE))))
              * sqrt(list_sum(list_transform(qv, x -> (x::DOUBLE)*(x::DOUBLE)))))
      ELSE 0.0 END, 6) AS cosine
  FROM c CROSS JOIN q
  WHERE nbr_id != query_id
),
ranked AS (
  SELECT query_id, nbr_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id ASC) AS rank
  FROM scored
)
SELECT query_id, nbr_id, cosine, rank FROM ranked WHERE rank <= 10
"""


def q_emb_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: multiprobe bucket equi-join + exact rescore.

    FULLY oracle-checked: the hyperplanes are deterministic constants, so
    the oracle (sql_emb_topk_lsh) embeds the same planes as SQL literals
    and replays the identical signature -> probe -> equi-join -> rescore
    pipeline in DuckDB. The recall/scan-fraction gate is additionally
    pytest-asserted on a clustered corpus."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    out = cosine_topk_lsh(emb, queries, k=10)
    return out.withColumn("rank", F.col("rank").cast("long"))


def q_emb_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-cell ANN variant — oracle-checked the same way (deterministic
    centroids embedded as SQL literals in sql_emb_topk_ivf)."""
    from debezium_connector_spanner_spark.functions.similarity import cosine_topk_ivf

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    out = cosine_topk_ivf(emb, queries, k=10)
    return out.withColumn("rank", F.col("rank").cast("long"))


def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the embedding leg of the
    dedup family (exact/Jaccard/MinHash/SimHash/embedding-cosine).

    The sandbox embeddings are near-random (max natural pair cosine
    ~0.51), so the query deterministically plants near-duplicates from
    the corpus itself: vectors with vec_id < 8 are copied to
    vec_id + 100000 with a fixed per-index perturbation
    (+0.02 * ((i % 5) - 2), float32 round-trip) — cosine vs the source
    ~0.999. Detection is the LSH bucket self-join
    (similarity.embedding_near_dup_pairs): never all-pairs. Fully
    oracle-checked: sql_emb_near_dup replants and replays the identical
    signature -> hamming-ball probe -> equi-join -> rescore pipeline in
    DuckDB with the hyperplanes as SQL literals.
    """
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.where(F.col("vec_id") < 8).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (
                x.cast("double") + 0.02 * ((i % 5).cast("double") - 2.0)
            ).cast("float"),
        ).alias("embedding"),
    )
    full = emb.unionByName(planted)
    return embedding_near_dup_pairs(full, threshold=0.9)


def sql_emb_near_dup(
    threshold: float = 0.9,
    n_planes: int = 12,
    max_hamming: int = 1,
    n_tables: int = 4,
    dim: int = 64,
) -> str:
    """DuckDB replica of q_emb_near_dup: same planted perturbation (with
    the float32 round-trip), same hyperplane literals, same sign-bit
    signatures, same hamming-ball self-join, same rescore + threshold."""
    from debezium_connector_spanner_spark.functions.similarity import (
        _probe_masks,
        hyperplanes,
    )

    plane_rows = ",\n  ".join(
        f"({t}, {i}, {_sql_dlist(p)})"
        for t in range(n_tables)
        for i, p in enumerate(hyperplanes(dim, n_planes, seed=11 + 97 * t))
    )
    mask_rows = ", ".join(f"({m})" for m in _probe_masks(n_planes, max_hamming))
    return f"""
WITH planes(t, i, p) AS (VALUES
  {plane_rows}
),
masks(m) AS (VALUES {mask_rows}),
full_emb AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         list_transform(range({dim}),
             i -> (embedding[i+1]::DOUBLE + 0.02*((i % 5) - 2))::FLOAT)
  FROM embeddings WHERE vec_id < 8
),
sig AS (
  SELECT e.vec_id, pl.t,
         SUM(CASE WHEN list_sum(list_transform(range({dim}),
                      j -> e.embedding[j+1]::DOUBLE * pl.p[j+1])) >= 0
                  THEN (1::BIGINT << pl.i) ELSE 0 END)::BIGINT AS sig
  FROM full_emb e CROSS JOIN planes pl
  GROUP BY e.vec_id, pl.t
),
probes AS (
  SELECT s.vec_id AS id_a, s.t, xor(s.sig, mk.m) AS bucket
  FROM sig s CROSS JOIN masks mk
),
cand AS (
  SELECT DISTINCT p.id_a, s.vec_id AS id_b
  FROM probes p JOIN sig s ON s.t = p.t AND s.sig = p.bucket
  WHERE p.id_a < s.vec_id
),
scored AS (
  SELECT c.id_a, c.id_b,
    round(
      CASE WHEN sqrt(list_sum(list_transform(ae.embedding, x -> (x::DOUBLE)*(x::DOUBLE)))) > 0
            AND sqrt(list_sum(list_transform(be.embedding, x -> (x::DOUBLE)*(x::DOUBLE)))) > 0
      THEN list_sum(list_transform(range({dim}),
                    j -> ae.embedding[j+1]::DOUBLE * be.embedding[j+1]::DOUBLE))
           / (sqrt(list_sum(list_transform(ae.embedding, x -> (x::DOUBLE)*(x::DOUBLE))))
              * sqrt(list_sum(list_transform(be.embedding, x -> (x::DOUBLE)*(x::DOUBLE)))))
      ELSE 0.0 END, 6) AS cosine
  FROM cand c
  JOIN full_emb ae ON ae.vec_id = c.id_a
  JOIN full_emb be ON be.vec_id = c.id_b
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= {threshold!r}
"""


def _sql_dlist(vals) -> str:
    """A DuckDB DOUBLE[] literal."""
    return "[" + ", ".join(repr(float(x)) for x in vals) + "]::DOUBLE[]"


_SQL_RESCORE_TOPK = """
scored AS (
  SELECT c.query_id, c.nbr_id,
    round(
      CASE WHEN sqrt(list_sum(list_transform(ne.embedding, x -> (x::DOUBLE)*(x::DOUBLE)))) > 0
            AND sqrt(list_sum(list_transform(qe.embedding, x -> (x::DOUBLE)*(x::DOUBLE)))) > 0
      THEN list_sum(list_transform(range(len(ne.embedding)),
                    j -> ne.embedding[j+1]::DOUBLE * qe.embedding[j+1]::DOUBLE))
           / (sqrt(list_sum(list_transform(ne.embedding, x -> (x::DOUBLE)*(x::DOUBLE))))
              * sqrt(list_sum(list_transform(qe.embedding, x -> (x::DOUBLE)*(x::DOUBLE)))))
      ELSE 0.0 END, 6) AS cosine
  FROM cand c
  JOIN embeddings qe ON qe.vec_id = c.query_id
  JOIN embeddings ne ON ne.vec_id = c.nbr_id
),
ranked AS (
  SELECT query_id, nbr_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id ASC) AS rank
  FROM scored
)
SELECT query_id, nbr_id, cosine, rank FROM ranked WHERE rank <= {k}
"""


def sql_emb_topk_lsh(
    k: int = 10,
    n_planes: int = 12,
    max_hamming: int = 2,
    n_tables: int = 4,
    dim: int = 64,
) -> str:
    """DuckDB replica of cosine_topk_lsh: same deterministic hyperplanes
    (embedded as literals), same sign-bit signatures, same multiprobe
    hamming-ball XOR buckets, same dedup + exact-cosine rescore + top-k."""
    from debezium_connector_spanner_spark.functions.similarity import (
        _probe_masks,
        hyperplanes,
    )

    plane_rows = ",\n  ".join(
        f"({t}, {i}, {_sql_dlist(p)})"
        for t in range(n_tables)
        for i, p in enumerate(hyperplanes(dim, n_planes, seed=11 + 97 * t))
    )
    mask_rows = ", ".join(f"({m})" for m in _probe_masks(n_planes, max_hamming))
    return f"""
WITH planes(t, i, p) AS (VALUES
  {plane_rows}
),
masks(m) AS (VALUES {mask_rows}),
sig AS (
  SELECT e.vec_id, pl.t,
         SUM(CASE WHEN list_sum(list_transform(range({dim}),
                      j -> e.embedding[j+1]::DOUBLE * pl.p[j+1])) >= 0
                  THEN (1::BIGINT << pl.i) ELSE 0 END)::BIGINT AS sig
  FROM embeddings e CROSS JOIN planes pl
  GROUP BY e.vec_id, pl.t
),
probes AS (
  SELECT s.vec_id AS query_id, s.t, xor(s.sig, mk.m) AS bucket
  FROM sig s CROSS JOIN masks mk
  WHERE s.vec_id < 10
),
cand AS (
  SELECT DISTINCT p.query_id, s.vec_id AS nbr_id
  FROM probes p JOIN sig s ON s.t = p.t AND s.sig = p.bucket
  WHERE s.vec_id != p.query_id
),
{_SQL_RESCORE_TOPK.format(k=k)}
"""


def sql_emb_topk_ivf(
    k: int = 10, n_cells: int = 32, n_probe: int = 4, dim: int = 64
) -> str:
    """DuckDB replica of cosine_topk_ivf: same deterministic centroids,
    same argmax cell assignment (ties -> higher cell id, matching Spark's
    struct array_max), same top-n_probe query cells, same rescore."""
    from debezium_connector_spanner_spark.functions.similarity import ivf_centroids

    cent_rows = ",\n  ".join(
        f"({i}, {_sql_dlist(c)})" for i, c in enumerate(ivf_centroids(dim, n_cells))
    )
    return f"""
WITH cents(i, c) AS (VALUES
  {cent_rows}
),
scores AS (
  SELECT e.vec_id, ct.i,
         list_sum(list_transform(range({dim}),
             j -> e.embedding[j+1]::DOUBLE * ct.c[j+1])) AS d
  FROM embeddings e CROSS JOIN cents ct
),
cell AS (
  SELECT vec_id, i AS cell FROM (
    SELECT vec_id, i,
           row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, i DESC) AS rn
    FROM scores
  ) WHERE rn = 1
),
qcells AS (
  SELECT vec_id AS query_id, i AS cell FROM (
    SELECT vec_id, i,
           row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, i DESC) AS rn
    FROM scores WHERE vec_id < 10
  ) WHERE rn <= {n_probe}
),
cand AS (
  SELECT DISTINCT q.query_id, c.vec_id AS nbr_id
  FROM qcells q JOIN cell c ON c.cell = q.cell
  WHERE c.vec_id != q.query_id
),
{_SQL_RESCORE_TOPK.format(k=k)}
"""


# -------------------------------------------------------------- multimodal
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: synthetic media table -> mapInPandas feature
    extraction (decode kernel stubbed; schema/batching real).

    Oracle-checked: the synthetic payload is an ASCII sha256-hexdigest
    chain, so DuckDB reproduces payload_sha256/n_bytes exactly even though
    the decode kernel itself is a stub.
    """
    media = synth_media(spark, n=256)
    return extract_features(media).select(
        "media_id",
        "kind",
        "payload_sha256",
        F.col("n_bytes").cast("long").alias("n_bytes"),
    )


def q_media_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(spark, n=256)
    plan = frame_sample_plan(media, every_ms=5000)
    return plan.select(
        "media_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms")
    )


PIPELINE_QUERIES = {
    "docs_jaccard_pairs": q_docs_jaccard_pairs,
    "docs_minhash_lsh_pairs": q_docs_minhash_lsh,
    "docs_simhash": q_docs_simhash,
    "docs_simhash_near_pairs": q_docs_simhash_near,
    "docs_quality": q_docs_quality,
    "docs_langid": q_docs_langid,
    "docs_fingerprint": q_docs_fingerprint,
    "docs_fingerprint_dups": q_docs_fingerprint_dups,
    "emb_topk_bruteforce": q_emb_topk_bruteforce,
    "emb_topk_lsh": q_emb_topk_lsh,
    "emb_topk_ivf": q_emb_topk_ivf,
    "emb_near_dup_pairs": q_emb_near_dup,
    "media_features": q_media_features,
    "media_frame_plan": q_media_frame_plan,
}


def pipeline_oracles() -> dict[str, str]:
    return {
        "docs_jaccard_pairs": sql_docs_jaccard(max_df=100),
        "docs_minhash_lsh_pairs": sql_docs_jaccard(),  # LSH must reproduce exact set
        "docs_simhash": SQL_DOCS_SIMHASH_FP,
        "docs_simhash_near_pairs": SQL_DOCS_SIMHASH_NEAR,
        "docs_quality": SQL_DOCS_QUALITY,
        "docs_langid": sql_docs_langid(),
        "docs_fingerprint": SQL_DOCS_FINGERPRINT,
        "docs_fingerprint_dups": SQL_DOCS_FINGERPRINT_DUPS,
        "emb_topk_bruteforce": SQL_EMB_TOPK,
        "emb_topk_lsh": sql_emb_topk_lsh(),
        "emb_topk_ivf": sql_emb_topk_ivf(),
        "emb_near_dup_pairs": sql_emb_near_dup(),
        "media_features": SQL_MEDIA_FEATURES,
        "media_frame_plan": SQL_MEDIA_FRAME_PLAN,
    }


# Mirrors functions/multimodal.py synth_media + extract_features: payload is
# the ASCII hexdigest of sha256("5|i") repeated (17 + i % 13) times; the
# "feature extraction" identity columns (sha256 of payload, byte length) are
# therefore pure SQL. kind cycles image/audio/video by i % 3.
SQL_MEDIA_FEATURES = """
SELECT i::BIGINT AS media_id,
       CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       sha256(repeat(sha256('5|' || i::VARCHAR), 17 + i % 13)) AS payload_sha256,
       (64 * (17 + i % 13))::BIGINT AS n_bytes
FROM (SELECT range AS i FROM range(256))
"""

# Video rows (i % 3 = 2) exploded over sequence(0, duration_ms, 5000) with
# duration_ms = (1000 + i*37) % 60000 — same inclusive-endpoint semantics
# as Spark's F.sequence.
SQL_MEDIA_FRAME_PLAN = """
SELECT i::BIGINT AS media_id,
       unnest(generate_series(0, (1000 + i * 37) % 60000, 5000))::BIGINT AS frame_ts_ms
FROM (SELECT range AS i FROM range(256))
WHERE i % 3 = 2
"""


# ------------------------------------------------ dataset split
def q_docs_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality-gated train/val/test split — the assignment
    step of a training-data pipeline. The split key is a content-free
    hash of doc_id (md5 hex fold mod 100: <80 train, <90 val, else
    test), so the assignment is stable across runs, engines, and
    partitionings — re-running the pipeline on 100 TB reassigns nothing.
    Quality gate: non-empty text and >= 5 whitespace words (the
    docs_quality criteria a pipeline would filter on). All codegen —
    zero exchanges, no UDFs."""
    from debezium_connector_spanner_spark.functions.text import md5_hash64

    d = _t(spark, sf_dir, "documents")
    bucket = F.pmod(md5_hash64(F.col("doc_id").cast("string")), F.lit(100))
    n_words = F.size(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    )
    return (
        d.where((F.length(F.trim(F.col("text"))) > 0) & (n_words >= 5))
        .select(
            "doc_id",
            bucket.cast("long").alias("split_bucket"),
            F.when(bucket < 80, "train")
            .when(bucket < 90, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


# same md5 hex fold as _SQL_WIN_HASH but over CAST(doc_id AS VARCHAR)
_SQL_ID_HASH = (
    "CAST(list_sum(list_transform(range(15), j -> "
    "CAST(strpos('0123456789abcdef', "
    "md5(CAST(doc_id AS VARCHAR))[CAST(j + 1 AS INTEGER)]) - 1 AS BIGINT) "
    "<< CAST(4 * (14 - j) AS BIGINT))) AS BIGINT)"
)

SQL_DOCS_DATASET_SPLIT = f"""
WITH b AS (
  SELECT doc_id, {_SQL_ID_HASH} % 100 AS split_bucket
  FROM documents
  WHERE length(trim(text)) > 0
    AND len(regexp_split_to_array(lower(trim(text)), '\\s+')) >= 5
)
SELECT doc_id, split_bucket,
       CASE WHEN split_bucket < 80 THEN 'train'
            WHEN split_bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""

PIPELINE_QUERIES.update({"docs_dataset_split": q_docs_dataset_split})
_EXTRA_ORACLES = {"docs_dataset_split": SQL_DOCS_DATASET_SPLIT}

_base_pipeline_oracles = pipeline_oracles


def pipeline_oracles() -> dict[str, str]:  # noqa: F811 — extend in place
    out = _base_pipeline_oracles()
    out.update(_EXTRA_ORACLES)
    return out


def q_docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: ~10% of documents PER LANGUAGE by
    the same content-free doc_id hash as docs_dataset_split — balanced
    subsets whose membership is stable under re-runs and repartitioning
    (unlike rand()/TABLESAMPLE). Pure filter: no shuffle at all; the
    per-stratum rate could come from a broadcast dim without changing
    the shape."""
    from debezium_connector_spanner_spark.functions.text import md5_hash64

    d = _t(spark, sf_dir, "documents")
    bucket = F.pmod(md5_hash64(F.col("doc_id").cast("string")), F.lit(100))
    return d.where(bucket < 10).select(
        "doc_id", "lang", "source", F.col("n_chars").cast("long").alias("n_chars")
    )


SQL_DOCS_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
WHERE {_SQL_ID_HASH} % 100 < 10
"""

PIPELINE_QUERIES.update({"docs_stratified_sample": q_docs_stratified_sample})
_EXTRA_ORACLES["docs_stratified_sample"] = SQL_DOCS_STRATIFIED_SAMPLE


def q_docs_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-100 word bigrams — the wordcount-at-scale shape:
    explode → map-side-combined count → global top-k. The top-k is
    orderBy().limit(), which Spark plans as TakeOrderedAndProject
    (per-partition partial top-k merged on the driver — no global sort,
    no single-partition window). Tie order is total (count desc, bigram
    asc) so the result set is deterministic."""
    d = _t(spark, sf_dir, "documents")
    w = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    grams = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.array()
    ).otherwise(
        F.transform(
            F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
            lambda x, i: F.concat_ws(" ", x, F.element_at(w, i + 2)),
        )
    )
    return (
        d.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(100)
    )


SQL_DOCS_TOP_BIGRAMS = r"""
WITH toks AS (
  SELECT CASE WHEN length(trim(text)) = 0 THEN []
              ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS w
  FROM documents
), grams AS (
  SELECT unnest(CASE WHEN len(w) >= 2
    THEN [w[i+1] || ' ' || w[i+2] for i in range(len(w) - 1)]
    ELSE [] END) AS bigram
  FROM toks
)
SELECT bigram, count(*) AS n FROM grams
GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 100
"""

PIPELINE_QUERIES.update({"docs_top_bigrams": q_docs_top_bigrams})
_EXTRA_ORACLES["docs_top_bigrams"] = SQL_DOCS_TOP_BIGRAMS


def q_docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-set decontamination against a deterministic 'benchmark'
    slice (doc_id % 97 == 0 stands in for an eval set): every other doc
    is scored by how many distinct 5-grams it shares with ANY benchmark
    doc and flagged at >=3 overlaps. Benchmark grams broadcast; corpus
    text never shuffles (functions/dedup.py decontaminate)."""
    from debezium_connector_spanner_spark.functions.dedup import decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    return decontaminate(corpus, bench, "doc_id", "text", n=5, min_overlap=3)


SQL_DOCS_DECONTAMINATE = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []
              ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(w) >= 5
           THEN [array_to_string(w[i+1:i+5], ' ') for i in range(len(w) - 4)]
           ELSE [] END) AS shingles
  FROM toks
),
bench AS (
  SELECT DISTINCT unnest(shingles) AS sh FROM sh WHERE doc_id % 97 = 0
),
corpus AS (
  SELECT doc_id, unnest(shingles) AS sh FROM sh WHERE doc_id % 97 <> 0
),
hits AS (
  SELECT doc_id, count(*) AS n FROM corpus JOIN bench USING (sh) GROUP BY 1
)
SELECT d.doc_id,
  CAST(coalesce(n, 0) AS BIGINT) AS n_overlap,
  coalesce(n, 0) >= 3 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
LEFT JOIN hits USING (doc_id)
"""

PIPELINE_QUERIES.update({"docs_decontaminate": q_docs_decontaminate})
_BASE_PIPELINE_ORACLES = pipeline_oracles


def pipeline_oracles() -> dict[str, str]:  # noqa: F811 — extend the base map
    out = _BASE_PIPELINE_ORACLES()
    out["docs_decontaminate"] = SQL_DOCS_DECONTAMINATE
    return out


def q_docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining (functions/text.py
    pack_sequences): whitespace token counts, 32 deterministic shards,
    2048-token context windows; each doc's placement in the packed
    stream (shard, start offset, first bin, bins spanned)."""
    from debezium_connector_spanner_spark.functions.text import pack_sequences

    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), "\\s+"))
    counted = d.select(
        "doc_id",
        F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0))
        .otherwise(toks)
        .alias("n_tokens"),
    )
    return pack_sequences(counted, "doc_id", "n_tokens", context_len=2048, n_shards=32)


SQL_DOCS_PACK_SEQUENCES = r"""
WITH counted AS (
  SELECT doc_id,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n
  FROM documents
),
placed AS (
  SELECT doc_id, doc_id % 32 AS shard, n,
    sum(n) OVER (PARTITION BY doc_id % 32 ORDER BY doc_id) - n AS start_offset
  FROM counted
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
  CAST(start_offset AS BIGINT) AS start_offset,
  CAST(floor(start_offset / 2048) AS BIGINT) AS bin,
  CAST(CASE WHEN n = 0 THEN 0
       ELSE floor((start_offset + n - 1) / 2048) - floor(start_offset / 2048) + 1
       END AS BIGINT) AS n_bins
FROM placed
"""

PIPELINE_QUERIES.update({"docs_pack_sequences": q_docs_pack_sequences})
_BASE_PIPELINE_ORACLES2 = pipeline_oracles


def pipeline_oracles() -> dict[str, str]:  # noqa: F811 — extend the base map
    out = _BASE_PIPELINE_ORACLES2()
    out["docs_pack_sequences"] = SQL_DOCS_PACK_SEQUENCES
    return out


def q_emb_topk_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality surface (VERDICT r4 #8): per-query recall of the LSH
    top-k against the exact bruteforce top-k, as a driver-checkable
    result set rather than a pytest-only gate.

    Both legs reuse the registered operators (identical hyperplanes /
    tie order), so this is a pure set-intersection over two tiny per-query
    top-k lists — the join input is O(n_queries * k) rows, broadcastable
    at any corpus scale; the heavy lifting stays inside the ANN operators
    themselves."""
    bf = q_emb_topk_bruteforce(spark, sf_dir).select("query_id", "nbr_id")
    lsh = q_emb_topk_lsh(spark, sf_dir).select("query_id", "nbr_id")
    hits = (
        bf.join(lsh, ["query_id", "nbr_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    per_q = bf.groupBy("query_id").agg(F.count(F.lit(1)).alias("k_bf"))
    return per_q.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
        F.col("k_bf").cast("long").alias("k_bf"),
        F.round(
            F.coalesce(F.col("hits"), F.lit(0)) / F.col("k_bf"), 4
        ).alias("recall"),
    )


def sql_emb_topk_lsh_recall() -> str:
    # nested WITH inside parenthesized subqueries: DuckDB replays the
    # exact bruteforce and LSH pipelines, then intersects per query
    return f"""
WITH bf AS (SELECT query_id, nbr_id FROM ({SQL_EMB_TOPK})),
lsh AS (SELECT query_id, nbr_id FROM ({sql_emb_topk_lsh()})),
hits AS (
  SELECT query_id, count(*) AS hits FROM bf JOIN lsh USING (query_id, nbr_id)
  GROUP BY 1
),
kq AS (SELECT query_id, count(*) AS k_bf FROM bf GROUP BY 1)
SELECT kq.query_id,
  CAST(coalesce(hits.hits, 0) AS BIGINT) AS hits,
  CAST(kq.k_bf AS BIGINT) AS k_bf,
  round(coalesce(hits.hits, 0)::DOUBLE / kq.k_bf, 4) AS recall
FROM kq LEFT JOIN hits USING (query_id)
"""


PIPELINE_QUERIES.update({"emb_topk_lsh_recall": q_emb_topk_lsh_recall})
_BASE_PIPELINE_ORACLES3 = pipeline_oracles


def pipeline_oracles() -> dict[str, str]:  # noqa: F811 — extend the base map
    out = _BASE_PIPELINE_ORACLES3()
    out["emb_topk_lsh_recall"] = sql_emb_topk_lsh_recall()
    return out


def q_docs_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the MinHash-LSH pair
    graph (functions/dedup.py connected_components — iterative min-label
    propagation, one shuffle per round, converges in graph-diameter
    rounds), cluster id = min doc_id in the component, keep exactly that
    representative. Docs in no pair are their own kept singleton. The
    DuckDB oracle replays the identical pair set (sql_docs_jaccard —
    LSH is exact-verified) and closes it transitively with a recursive
    CTE, so the cluster assignment is fully oracle-checked."""
    from debezium_connector_spanner_spark.functions.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, "doc_id", "text", n=3, num_hashes=128, bands=32, threshold=0.8
    )
    cc = connected_components(pairs, "doc_a", "doc_b")
    return (
        d.select("doc_id")
        .join(cc, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).cast("long").alias("cluster_id"),
        )
        .withColumn("is_kept", F.col("doc_id") == F.col("cluster_id"))
    )


def sql_docs_dup_clusters() -> str:
    return f"""
WITH RECURSIVE lshpairs AS (
  SELECT doc_a, doc_b FROM ({sql_docs_jaccard()})
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM lshpairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM lshpairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (SELECT u AS node, least(u, min(v)) AS cluster FROM reach GROUP BY u)
SELECT d.doc_id,
  CAST(coalesce(c.cluster, d.doc_id) AS BIGINT) AS cluster_id,
  coalesce(c.cluster, d.doc_id) = d.doc_id AS is_kept
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
"""


PIPELINE_QUERIES.update({"docs_dup_clusters": q_docs_dup_clusters})
_BASE_PIPELINE_ORACLES4 = pipeline_oracles


def pipeline_oracles() -> dict[str, str]:  # noqa: F811 — extend the base map
    out = _BASE_PIPELINE_ORACLES4()
    out["docs_dup_clusters"] = sql_docs_dup_clusters()
    return out


def q_docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact (functions/text.py pii_scrub): emails, intl
    phone numbers, IPv4 literals -> counts + typed placeholders, pure
    codegen'd JVM regex (no UDF, no shuffle). The synthetic corpus has
    no natural PII, so the query PLANTS it deterministically from
    doc_id (email every 5th doc, phone every 7th, IP every 11th) with
    the identical construction in the SQL oracle; the redacted text is
    compared by sha256. Patterns are Java-regex/RE2-agreement-safe
    (character classes only, no lookaround, no \\s)."""
    from debezium_connector_spanner_spark.functions.text import pii_scrub

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit(" contact u"), did.cast("string"), F.lit("@example.com now")
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 7 == 0,
                F.concat(
                    F.lit(" call +1-555-"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 11 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (did % 256).cast("string"),
                    F.lit("."),
                    ((did % 254) + 1).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = pii_scrub(aug)
    return out.select(
        "doc_id",
        "n_emails",
        "n_ips",
        "n_phones",
        F.sha2("redacted", 256).alias("redacted_sha"),
    )


def sql_docs_pii_scrub() -> str:
    from debezium_connector_spanner_spark.functions.text import (
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
    )

    return f"""
WITH aug AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 5 = 0
       THEN ' contact u' || doc_id || '@example.com now' ELSE '' END
    || CASE WHEN doc_id % 7 = 0
       THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       ELSE '' END
    || CASE WHEN doc_id % 11 = 0
       THEN ' from 10.0.' || (doc_id % 256) || '.' || (doc_id % 254 + 1)
       ELSE '' END AS text
  FROM documents
),
s1 AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
    regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
  FROM aug
),
s2 AS (
  SELECT doc_id, n_emails,
    CAST(len(regexp_extract_all(t1, '{PII_IPV4_RE}')) AS BIGINT) AS n_ips,
    regexp_replace(t1, '{PII_IPV4_RE}', '<IP>', 'g') AS t2
  FROM s1
),
s3 AS (
  SELECT doc_id, n_emails, n_ips,
    CAST(len(regexp_extract_all(t2, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones,
    regexp_replace(t2, '{PII_PHONE_RE}', '<PHONE>', 'g') AS t3
  FROM s2
)
SELECT doc_id, n_emails, n_ips, n_phones, sha256(t3) AS redacted_sha FROM s3
"""


PIPELINE_QUERIES.update({"docs_pii_scrub": q_docs_pii_scrub})
_BASE_PIPELINE_ORACLES5 = pipeline_oracles


def pipeline_oracles() -> dict[str, str]:  # noqa: F811 — extend the base map
    out = _BASE_PIPELINE_ORACLES5()
    out["docs_pii_scrub"] = sql_docs_pii_scrub()
    return out


def q_docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher-style filters a
    pretraining pipeline runs corpus-wide): per doc, the duplicate-line
    fraction (1 - distinct/total lines — pure narrow JVM expressions,
    no shuffle) and the top word-bigram share (most frequent bigram's
    occurrences over total bigrams — explode + map-side-combined count,
    ONE shuffle keyed (doc_id, bigram), the wordcount shape that scales
    to any corpus). repetitive flags docs past the published-style
    thresholds (top-bigram share > 0.18 or dup-line fraction > 0.30)."""
    d = _t(spark, sf_dir, "documents")
    lines = F.split(F.col("text"), "\n")
    w = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    grams = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.array()
    ).otherwise(
        F.transform(
            F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
            lambda x, i: F.concat_ws(" ", x, F.element_at(w, i + 2)),
        )
    )
    base = d.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.round(
            1.0 - F.size(F.array_distinct(lines)) / F.size(lines), 6
        ).alias("dup_line_frac"),
        grams.alias("grams"),
    )
    top = (
        base.select("doc_id", F.explode("grams").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("top_n"), F.sum("n").alias("total_n"))
    )
    out = (
        base.drop("grams")
        .join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            "dup_line_frac",
            F.round(
                F.coalesce(F.col("top_n") / F.col("total_n"), F.lit(0.0)), 6
            ).alias("top_bigram_share"),
        )
    )
    return out.withColumn(
        "repetitive",
        (F.col("top_bigram_share") > 0.18) | (F.col("dup_line_frac") > 0.30),
    )


SQL_DOCS_REPETITION = r"""
WITH lines AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
),
lstats AS (
  SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
    round(1.0 - len(list_distinct(ls)) / CAST(len(ls) AS DOUBLE), 6)
      AS dup_line_frac
  FROM lines
),
toks AS (
  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
              ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS w
  FROM documents
),
grams AS (
  SELECT doc_id, unnest(CASE WHEN len(w) >= 2
    THEN [w[i+1] || ' ' || w[i+2] for i in range(len(w) - 1)]
    ELSE [] END) AS g
  FROM toks
),
counted AS (
  SELECT doc_id, g, count(*) AS n FROM grams GROUP BY 1, 2
),
top AS (
  SELECT doc_id, max(n) AS top_n, sum(n) AS total_n FROM counted GROUP BY 1
)
SELECT l.doc_id, l.n_lines, l.dup_line_frac,
  round(coalesce(top.top_n / CAST(top.total_n AS DOUBLE), 0.0), 6)
    AS top_bigram_share,
  (round(coalesce(top.top_n / CAST(top.total_n AS DOUBLE), 0.0), 6) > 0.18
   OR l.dup_line_frac > 0.30) AS repetitive
FROM lstats l LEFT JOIN top ON l.doc_id = top.doc_id
"""


PIPELINE_QUERIES.update({"docs_repetition": q_docs_repetition})
_BASE_PIPELINE_ORACLES6 = pipeline_oracles


def pipeline_oracles() -> dict[str, str]:  # noqa: F811 — extend the base map
    out = _BASE_PIPELINE_ORACLES6()
    out["docs_repetition"] = SQL_DOCS_REPETITION
    return out
