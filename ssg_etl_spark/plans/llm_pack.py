"""LLM training-data pipeline pack: dedup, similarity search, text
analysis, multimodal plumbing (BASELINE.json north-star extensions —
first-class components alongside the reference's own surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssg_etl_spark.operators import (
    analytics,
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
    web,
)
from ssg_etl_spark.partitioning import fan_out
from ssg_etl_spark.plans.registry import register
from ssg_etl_spark.sources.tables import load_table

# Shared oracle fragment: DISTINCT 3-word shingles per document. DuckDB 1.0
# cannot lateral-join generate_series on a column, so a bounded range
# (documents are ≤ ~100 words) is cross-joined and filtered.
SHINGLES_SQL = """
wordarrs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
shingles AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM wordarrs, range(1, 1024) g(i) WHERE i <= len(ws) - 2)
"""

# Mirrors dedup.DEFAULT_MAX_SHINGLE_DF: Jaccard is over the df-capped
# shingle universe in both engines (hot-shingle skew guard for the
# shingle-equality self-join).
JACCARD_SQL = f"""
WITH {SHINGLES_SQL},
capped AS (
  SELECT doc_id, shingle FROM shingles
  QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= {dedup.DEFAULT_MAX_SHINGLE_DF}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
  CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5
"""


@register(
    "dedup_exact",
    oracle=r"""
WITH norm AS (
  SELECT doc_id,
    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash
  FROM documents)
SELECT content_hash, MIN(doc_id) AS canonical_doc_id, COUNT(*) AS n_duplicates
FROM norm GROUP BY 1
""",
    tags=("llm", "dedup"),
    extra=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalized-content digest → hash groupBy."""
    return dedup.exact_dedup_groups(load_table(spark, sf_dir, "documents"))


@register("dedup_ngram_jaccard", oracle=JACCARD_SQL, tags=("llm", "dedup"), extra=True)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-word-shingle Jaccard near-dup pairs (threshold 0.5)."""
    return dedup.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), 0.5)


@register(
    "dedup_jaccard_prefix",
    oracle=JACCARD_SQL,
    tags=("llm", "dedup"),
    extra=True,
)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard pairs via prefix filtering — LOSSLESS candidate
    pruning by the prefix-filter lemma (rarest-first global shingle
    order), then exact verification; identical result set to
    dedup_ngram_jaccard, hence the shared oracle
    (operators/dedup.py:ngram_jaccard_pairs_prefix)."""
    return dedup.ngram_jaccard_pairs_prefix(
        load_table(spark, sf_dir, "documents"), 0.5
    )


@register("dedup_minhash_lsh", oracle=JACCARD_SQL, tags=("llm", "dedup"), extra=True)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates, exact-verified — equals the exact operator
    up to LSH recall (P(miss) ≈ (1-s²)^32: ~1e-40 at the data's s≈0.98),
    hence shares its oracle."""
    return dedup.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"), 0.5)


# The banded candidate join is lossless for Hamming ≤ 7 (pigeonhole over 8
# bands), so the oracle can use the straightforward O(N²) signature
# comparison: same 60-bit md5-derived shingle hash, same ±1 bit votes, same
# sign packing — bit-identical signatures in both engines.
SIMHASH_SQL = f"""
WITH {SHINGLES_SQL},
hashed AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h
  FROM shingles),
bitvotes AS (
  SELECT doc_id, g.bit AS bit,
    CASE WHEN (h >> g.bit) & 1 = 1 THEN 1 ELSE -1 END AS vote
  FROM hashed, range(0, 60) g(bit)),
perbit AS (SELECT doc_id, bit, SUM(vote) AS v FROM bitvotes GROUP BY 1, 2),
sig AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT)
      AS simhash
  FROM perbit GROUP BY 1)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 7
"""


@register("dedup_simhash", oracle=SIMHASH_SQL, tags=("llm", "dedup"), extra=True)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 7 over 60-bit md5-derived
    signatures, 8-band candidate generation — lossless for that bound by
    pigeonhole, so the exact pairwise oracle is the same set)."""
    return dedup.simhash_pairs(load_table(spark, sf_dir, "documents"))


COSINE_SQL = """
list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
/ (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
 * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
"""


COSINE_TOPK_SQL = f"""
WITH scored AS (
  SELECT b.vec_id AS query_id, a.vec_id AS vec_id, {COSINE_SQL} AS cosine_sim
  FROM embeddings a, embeddings b
  WHERE b.vec_id % 100 = 0 AND a.vec_id <> b.vec_id)
SELECT query_id, rank, vec_id, cosine_sim FROM (
  SELECT query_id, vec_id, cosine_sim,
    row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rank
  FROM scored) t
WHERE rank <= 10
"""


@register(
    "embedding_cosine_topk",
    oracle=COSINE_TOPK_SQL,
    tags=("llm", "similarity"),
    extra=True,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vectors (vec_id % 100 = 0)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return similarity.brute_force_topk(emb, queries, k=10)


# Round 5: the PUBLIC embedding_near_dup slot is the LSH-bucketed scale
# path (registered below, next to its shared oracle CTE); the exact O(N²)
# self-join survives here as the *(extra)* verification baseline — at
# 100 TB nobody runs all-pairs, but the baseline is what recall is
# measured against (tests/test_similarity.py).
@register(
    "embedding_near_dup_exact",
    oracle=f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {COSINE_SQL} AS cosine_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {COSINE_SQL} >= 0.45
""",
    tags=("llm", "dedup", "similarity"),
)
def embedding_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs embedding-cosine near-duplicate pairs (cosine ≥
    0.45) — the O(N²) exactness baseline for the public LSH-bucketed
    ``embedding_near_dup``."""
    return similarity.embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), 0.45
    )


# The LSH pipeline is fully deterministic (anchors are the first 24 corpus
# vectors; buckets are dot-product sign patterns), so the oracle replays the
# identical pipeline with DuckDB list lambdas: 8 tables × 3 hyperplane bits,
# bucket = the 3-bit pattern as an integer, candidates = any shared
# (table, bucket), then exact cosine rank — the same rows, approximation
# included.
ANN_LSH_SQL = f"""
WITH alist AS (
  SELECT list(CAST(embedding AS DOUBLE[]) ORDER BY vec_id) AS anchors
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 24)),
ebits AS (
  SELECT e.vec_id,
    list_transform(al.anchors,
      x -> CASE WHEN list_dot_product(x, CAST(e.embedding AS DOUBLE[])) > 0
           THEN 1 ELSE 0 END) AS bits
  FROM embeddings e, alist al),
ebuckets AS (
  SELECT vec_id, t.t AS tbl,
    bits[t.t*3+1]*4 + bits[t.t*3+2]*2 + bits[t.t*3+3] AS bucket
  FROM ebits, range(0, 8) t(t)),
qbuckets AS (
  SELECT vec_id AS query_id, tbl, bucket FROM ebuckets WHERE vec_id % 100 = 0),
cand AS (
  SELECT DISTINCT q.query_id, e.vec_id
  FROM ebuckets e JOIN qbuckets q USING (tbl, bucket)
  WHERE e.vec_id <> q.query_id),
scored AS (
  SELECT c.query_id, c.vec_id, {COSINE_SQL} AS cosine_sim
  FROM cand c
  JOIN embeddings a ON c.vec_id = a.vec_id
  JOIN embeddings b ON c.query_id = b.vec_id)
SELECT query_id, rank, vec_id, cosine_sim FROM (
  SELECT query_id, vec_id, cosine_sim,
    row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id)
      AS rank
  FROM scored) t
WHERE rank <= 10
"""


@register("ann_lsh_topk", oracle=ANN_LSH_SQL, tags=("llm", "similarity"), extra=True)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via anchor-hyperplane LSH buckets — the scale path.
    Deterministic anchors + sign-pattern buckets make the whole pipeline
    (approximation included) replayable as SQL, so the oracle checks the
    exact candidate/rank set, not just recall."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # bits pinned: the oracle replays THIS bucketization; the operator
    # default auto-scales with corpus size instead.
    return similarity.lsh_bucketed_topk(
        emb, queries, k=10, n_tables=8, bits_per_table=3
    )


# The AUTO-BITS twin (r9): bits scale with corpus size exactly as the
# operational path does (similarity.auto_bits_per_table — integer-exact
# ceil(log2(ceil(n/occupancy))), floored at 3), so per-bucket occupancy —
# and with it the candidate join's Σocc² cost — stays ~constant as the
# corpus grows. This closes the sf1.0 finding that the PINNED-bits
# registry query super-scales by construction (tools/sf1_embedding_r9:
# 7.2× wall at 10× data): the auto form is the one a deployment runs.
# The oracle computes the SAME bit count from COUNT(*) in pure integer
# SQL (no float log — a 1-ulp libm disagreement would shift a whole
# bucket bit) and replays the dynamic-width bucketization with string
# bucket ids (equality is all a bucket id needs).
from ssg_etl_spark.operators.similarity import AUTO_BITS_TARGET_OCCUPANCY  # noqa: E402

_LSH_AUTO_TABLES = 8

ANN_LSH_AUTO_SQL = f"""
WITH bitsq AS (
  SELECT MIN(b) AS bits
  FROM range(3, 31) r(b), (SELECT COUNT(*) AS n FROM embeddings) c
  WHERE (CAST(1 AS BIGINT) << b)
        >= GREATEST(2, (c.n + {AUTO_BITS_TARGET_OCCUPANCY - 1})
                       // {AUTO_BITS_TARGET_OCCUPANCY})),
alist AS (
  SELECT list(emb ORDER BY rn) AS anchors
  FROM (
    SELECT CAST(embedding AS DOUBLE[]) AS emb,
           row_number() OVER (ORDER BY vec_id) AS rn
    FROM embeddings) a, bitsq q
  WHERE a.rn <= {_LSH_AUTO_TABLES} * q.bits),
ebits AS (
  SELECT e.vec_id,
    list_transform(al.anchors,
      x -> CASE WHEN list_dot_product(x, CAST(e.embedding AS DOUBLE[])) > 0
           THEN '1' ELSE '0' END) AS sbits
  FROM embeddings e, alist al),
ebuckets AS (
  SELECT s.vec_id, t.t AS tbl,
    array_to_string(
      array_slice(s.sbits, t.t * q.bits + 1, (t.t + 1) * q.bits), ''
    ) AS bucket
  FROM ebits s, bitsq q, range(0, {_LSH_AUTO_TABLES}) t(t)),
qbuckets AS (
  SELECT vec_id AS query_id, tbl, bucket FROM ebuckets WHERE vec_id % 100 = 0),
cand AS (
  SELECT DISTINCT q.query_id, e.vec_id
  FROM ebuckets e JOIN qbuckets q USING (tbl, bucket)
  WHERE e.vec_id <> q.query_id),
scored AS (
  SELECT c.query_id, c.vec_id, {COSINE_SQL} AS cosine_sim
  FROM cand c
  JOIN embeddings a ON c.vec_id = a.vec_id
  JOIN embeddings b ON c.query_id = b.vec_id)
SELECT query_id, rank, vec_id, cosine_sim FROM (
  SELECT query_id, vec_id, cosine_sim,
    row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id)
      AS rank
  FROM scored) t
WHERE rank <= 10
"""


@register(
    "ann_lsh_topk_auto",
    oracle=ANN_LSH_AUTO_SQL,
    tags=("llm", "similarity", "scale"),
)
def ann_lsh_topk_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupancy-stable LSH top-k: bits auto-scale with corpus size
    (similarity.auto_bits_per_table), holding per-bucket occupancy — the
    candidate-cost driver — roughly constant across scale decades. The
    oracle recomputes the identical integer bit count from COUNT(*) and
    replays the dynamic-width bucketization, so the approximation itself
    stays driver-checkable even though the bucket grid depends on the
    data size."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return similarity.lsh_bucketed_topk(
        emb, queries, k=10, n_tables=_LSH_AUTO_TABLES, bits_per_table=None
    )


@register(
    "ann_ivf_topk",
    oracle=COSINE_TOPK_SQL,
    tags=("llm", "similarity"),
    extra=True,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN exactness query: with n_probe == n_cells
    every cell is probed, so the index must return exactly the brute-force
    top-k — the strongest oracle an ANN structure admits (it exercises
    training, assignment, probing, and re-ranking end to end; any drift in
    cell assignment or tie-breaking flips the hash). Default-probe recall
    is pinned separately by tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return similarity.ivf_topk(emb, queries, k=10, n_cells=16, n_probe=16)


@register(
    "ann_ivf_probe",
    oracle=COSINE_TOPK_SQL,
    tags=("llm", "similarity"),
    extra=True,
)
def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OPERATIONAL IVF shape: build the index once, round-trip it
    through parquet (centroids + inverted file — exactly what a 100 TB
    deployment persists), and answer the query batch by probing the
    loaded tables only. Full probe (n_probe == n_cells) ⟹ results equal
    brute force, so the parquet round-trip is inside the exactness oracle:
    any serialization drift in centroids or cell assignment flips the
    hash. The probe-≪-build wall split is measured in bench.py; recall at
    default n_probe is pinned by tests/test_similarity.py."""
    import atexit
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = similarity.build_ivf_index(emb, n_cells=16)
    idx_dir = tempfile.mkdtemp(prefix="ivfidx_")
    # The probe reads these files at EXECUTION time, so the dir cannot be
    # removed inside the builder; register process-exit cleanup instead of
    # leaking one index dir per invocation (bench.py's own IVF block uses
    # try/finally because it controls execution; a registry builder does
    # not).
    atexit.register(shutil.rmtree, idx_dir, True)
    idx["centroids"].write.mode("overwrite").parquet(f"{idx_dir}/centroids")
    # Partitioned by cell: a default-n_probe probe prunes to the cells it
    # reads (at fixture scale the pruning is cosmetic; the layout is the
    # point).
    idx["cells"].write.mode("overwrite").partitionBy("cell").parquet(
        f"{idx_dir}/cells"
    )
    return similarity.ivf_topk_vs_index(
        spark.read.parquet(f"{idx_dir}/centroids"),
        spark.read.parquet(f"{idx_dir}/cells"),
        queries,
        k=10,
        n_probe=16,
    )


_EN_STOPWORDS = ",".join(f"'{w}'" for w in text.LANG_LEXICONS["en"])

@register(
    "text_quality_metrics",
    oracle=rf"""
WITH m AS (
  SELECT doc_id,
    length(text) AS n_chars,
    len(string_split(text, ' ')) AS n_words,
    len(list_filter(string_split(text, ' '),
        w -> list_contains([{_EN_STOPWORDS}], w))) AS stopword_hits,
    length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
  FROM documents)
SELECT doc_id, n_chars, n_words,
  round(CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words, 6) AS avg_word_len,
  stopword_hits,
  round(CAST(stopword_hits AS DOUBLE) / n_words, 6) AS stopword_ratio,
  n_punct,
  round(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
  round(
    CAST(stopword_hits AS DOUBLE) / n_words * 0.5
    + CASE WHEN CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words BETWEEN 3 AND 10
           THEN 0.3 ELSE 0.0 END
    + CASE WHEN CAST(n_punct AS DOUBLE) / n_chars <= 0.1 THEN 0.2 ELSE 0.0 END,
    6) AS quality_score
FROM m
""",
    tags=("llm", "text"),
    extra=True,
)
def text_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring (C4/Gopher-style heuristics)."""
    return text.text_metrics(load_table(spark, sf_dir, "documents"))


@register(
    "token_counts",
    oracle=f"""
SELECT doc_id,
  len(string_split(text, ' ')) AS ws_tokens,
  len(regexp_extract_all(text, '{text.TOKEN_REGEX}')) AS regex_tokens
FROM documents
""",
    tags=("llm", "text"),
    extra=True,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counting."""
    return text.token_counts(load_table(spark, sf_dir, "documents"))


def _langid_oracle() -> str:
    score_cols = ",\n    ".join(
        "len(list_filter(string_split(text, ' '), w -> list_contains(["
        + ",".join(f"'{w}'" for w in lex)
        + f"], w))) AS score_{lang}"
        for lang, lex in sorted(text.LANG_LEXICONS.items())
    )
    langs = sorted(text.LANG_LEXICONS)
    g = "greatest(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    branches = "\n    ".join(
        f"WHEN score_{lg} = {g} THEN '{lg}'" for lg in langs
    )
    return f"""
WITH s AS (
  SELECT doc_id,
    {score_cols}
  FROM documents)
SELECT doc_id, {", ".join(f"score_{lg}" for lg in langs)},
  CASE WHEN {g} = 0 THEN 'und'
    {branches}
    ELSE 'und' END AS predicted_lang
FROM s
"""


@register("lang_id", oracle=_langid_oracle(), tags=("llm", "text"), extra=True)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic n-gram/stopword language ID with deterministic argmax."""
    return text.lang_id(load_table(spark, sf_dir, "documents"))


@register(
    "doc_fingerprints",
    oracle=r"""
SELECT doc_id,
  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_fp,
  md5(array_to_string(
    list_sort(list_distinct(string_split(
      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))), ' ')) AS bag_fp
FROM documents
""",
    tags=("llm", "text"),
    extra=True,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content + bag-of-words fingerprints (md5, engine-portable)."""
    return text.fingerprints(load_table(spark, sf_dir, "documents"))


# The fake decoder's feature vector is md5-digest bytes scaled to [0,1];
# digest byte i is hex pair [2i, 2i+1] of md5(payload), so the oracle can
# recompute the features exactly. The driver's canonicalizer cannot hash
# array cells, so the query emits the vector as a comma-joined integer
# string (feature[i] * 255 == digest byte, exactly).
_MEDIA_BYTES = ", ".join(
    f"CAST(('0x' || substr(md5(text), {2 * i + 1}, 2)) AS INTEGER)"
    for i in range(multimodal.FEATURE_DIM)
)


@register(
    "media_features",
    oracle=f"""
SELECT doc_id AS asset_id,
  (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS media_type,
  octet_length(encode(text)) AS payload_bytes,
  concat_ws(',', {_MEDIA_BYTES}) AS feature_bytes
FROM documents
""",
    tags=("llm", "multimodal"),
    extra=True,
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload table → Arrow-batched feature
    extraction (decode stubbed — deterministic fake; schema/partitioning/
    batch shape real). The array<double> feature column is projected to a
    deterministic integer string so the driver can hash it (its pandas
    canonicalizer cannot sort list cells)."""
    assets = multimodal.media_from_documents(load_table(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(assets, fake=True)
    byte_str = F.transform(
        F.col("feature"), lambda x: F.round(x * 255).cast("int").cast("string")
    )
    return feats.select(
        "asset_id",
        "media_type",
        "payload_bytes",
        F.concat_ws(",", byte_str).alias("feature_bytes"),
    )


# Real-codec oracle: the PPM raster is the text md5 digest cycled to
# 3·16·h = 48h bytes (whole digest repeats), so per-asset pixel
# statistics over the raster equal the statistics over the 16 digest
# bytes — exactly, including the mean (sum·3h / 48h vs sum/16: same real
# quotient, same IEEE rounding). Header "P6\n16 {h}\n255\n" is 12 bytes
# for single-digit h (h = doc_id%4+1 ≤ 4).
@register(
    "media_features_ppm",
    oracle="""
WITH b AS (
  SELECT doc_id, CAST(('0x' || substr(md5(text), 2*i+1, 2)) AS INTEGER) AS byte
  FROM documents, range(0, 16) g(i)),
s AS (SELECT doc_id, SUM(byte) AS sb, MIN(byte) AS mn, MAX(byte) AS mx
      FROM b GROUP BY 1)
SELECT doc_id AS asset_id,
  CAST(12 + 48 * (doc_id % 4 + 1) AS BIGINT) AS payload_bytes,
  CAST(16 AS INT) AS width,
  CAST(doc_id % 4 + 1 AS INT) AS height,
  CAST(16 * (doc_id % 4 + 1) AS INT) AS n_pixels,
  round(CAST(sb AS DOUBLE) / 16, 6) AS mean_byte,
  mn AS min_byte,
  mx AS max_byte
FROM s
""",
    tags=("llm", "multimodal"),
    extra=True,
)
def media_features_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline UN-FAKED end-to-end: synthesize binary PPM
    images (Arrow encode stage), then extract_features with fake=False —
    the pure-stdlib P6 decoder parses every header and computes real
    whole-raster pixel statistics."""
    assets = multimodal.ppm_assets_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    feats = multimodal.extract_features(assets, fake=False)
    return feats.select(
        "asset_id",
        "payload_bytes",
        F.element_at("feature", 1).cast("int").alias("width"),
        F.element_at("feature", 2).cast("int").alias("height"),
        F.element_at("feature", 3).cast("int").alias("n_pixels"),
        F.round(F.element_at("feature", 4), 6).alias("mean_byte"),
        F.element_at("feature", 5).cast("int").alias("min_byte"),
        F.element_at("feature", 6).cast("int").alias("max_byte"),
    )


# Real-codec RESIZE oracle (round 8): nearest-neighbor is pure integer
# index math, so DuckDB can replay every output byte. Source raster is the
# digest cycled (byte k = digest[k % 16]); target pixel (r, c) channel ch
# reads source byte ((sr*16 + sc)*3 + ch) with sr = ((2r+1)*h)//16,
# sc = 2c+1 (exact ((2c+1)*16)//(2*8)) — the same ((2i+1)*src)//(2*dst)
# arithmetic as operators/multimodal.py:_ppm_resize. The digest compares
# as md5 over the lowercase-hex payload INCLUDING the 11-byte P6 header
# (inlined as a hex literal).
_RPW = _RPH = 8
_RP_RASTER = _RPW * _RPH * 3  # 192
_RP_HDR_HEX = (b"P6\n%d %d\n255\n" % (_RPW, _RPH)).hex()


@register(
    "media_resize_ppm",
    oracle=f"""
WITH d AS (
  SELECT doc_id, md5(text) AS hx, doc_id % 4 + 1 AS h FROM documents),
b AS (
  SELECT d.doc_id, p.p,
    substr(d.hx,
      2 * ((((((2 * (p.p // 24) + 1) * d.h) // 16) * 16
            + (2 * ((p.p % 24) // 3) + 1)) * 3 + p.p % 3) % 16) + 1,
      2) AS hb
  FROM d, range(0, {_RP_RASTER}) p(p))
SELECT doc_id AS asset_id,
  CAST({_RPW} AS INT) AS width, CAST({_RPH} AS INT) AS height,
  CAST({11 + _RP_RASTER} AS BIGINT) AS payload_bytes,
  md5('{_RP_HDR_HEX}' || string_agg(hb, '' ORDER BY p)) AS payload_digest
FROM b GROUP BY doc_id
""",
    tags=("llm", "multimodal"),
    extra=True,
)
def media_resize_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize UN-FAKED end-to-end: binary PPM assets through
    the numpy nearest-neighbor resample inside the Arrow mapInPandas
    stage (fake=False), output bytes verified byte-for-byte by a DuckDB
    replay of the integer index arithmetic."""
    assets = multimodal.ppm_assets_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    resized = multimodal.resize_images(assets, _RPW, _RPH, fake=False)
    return resized.select(
        "asset_id",
        "width",
        "height",
        "payload_bytes",
        F.md5(F.lower(F.hex("payload")).cast("binary")).alias("payload_digest"),
    )


@register(
    "media_audio_wav_features",
    oracle=f"""
WITH params AS (
  SELECT doc_id,
         {multimodal.WAV_BASE_SAMPLES} + (doc_id % 5) * 32 AS n
  FROM documents),
idx AS (
  SELECT doc_id, n, UNNEST(generate_series(0, n - 1)) AS i FROM params),
vals AS (
  SELECT doc_id, n, i,
    ((doc_id * 31 + i * 7919) % 65536) - 32768 AS s
  FROM idx),
lagged AS (
  SELECT *, LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM vals)
SELECT doc_id AS asset_id,
  CAST({multimodal.WAV_SAMPLE_RATE} AS BIGINT) AS sample_rate,
  CAST(MAX(n) AS BIGINT) AS n_samples,
  CAST(MAX(n) * 1000 // {multimodal.WAV_SAMPLE_RATE} AS BIGINT)
    AS duration_ms,
  CAST(SUM(s * s) AS BIGINT) AS sum_sq,
  CAST(MAX(ABS(s)) AS BIGINT) AS peak,
  CAST(SUM(CASE WHEN prev IS NOT NULL AND (prev < 0) <> (s < 0)
                THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
FROM lagged GROUP BY doc_id
""",
    tags=("llm", "multimodal", "audio"),
)
def media_audio_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio leg of the multimodal story UN-FAKED end-to-end (r10): one
    REAL mono 16-bit PCM WAV per document (stdlib ``wave`` encoder over a
    pure-integer waveform of (doc_id, i)), decoded back through the real
    reader inside the Arrow mapInPandas stage, then reduced to the
    integer features a curation pipeline filters on — energy, peak,
    zero-crossing count, duration. The oracle replays formula → features
    directly (no WAV parsing in SQL), so a hash match proves the
    encode→decode round-trip preserved every sample."""
    assets = multimodal.wav_assets_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    return multimodal.audio_features(assets)


# PNG round-trip oracle (r11): raster = text md5 digest cycled to
# 3·16·h whole-digest repeats (like the PPM twin), so integer pixel
# stats are digest stats scaled by 3h, and the decoded-raster digest is
# md5 over the digest hex repeated 3h times. A hash match proves the
# stdlib DEFLATE compress → inflate → unfilter path returned every
# original byte — the first genuinely COMPRESSED codec in the family.
@register(
    "media_png_features",
    oracle="""
WITH b AS (
  SELECT doc_id, CAST(('0x' || substr(md5(text), 2*i+1, 2)) AS INTEGER) AS byte
  FROM documents, range(0, 16) g(i)),
s AS (SELECT doc_id, SUM(byte) AS sb, MIN(byte) AS mn, MAX(byte) AS mx
      FROM b GROUP BY 1)
SELECT s.doc_id AS asset_id,
  CAST(16 AS INT) AS width,
  CAST(s.doc_id % 4 + 1 AS INT) AS height,
  CAST(16 * (s.doc_id % 4 + 1) AS INT) AS n_pixels,
  CAST(3 * (s.doc_id % 4 + 1) * sb AS BIGINT) AS sum_byte,
  CAST(mn AS INT) AS min_byte,
  CAST(mx AS INT) AS max_byte,
  md5(repeat(md5(d.text), 3 * (s.doc_id % 4 + 1))) AS raster_digest
FROM s JOIN documents d ON s.doc_id = d.doc_id
""",
    tags=("llm", "multimodal"),
)
def media_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED image codec UN-FAKED end-to-end (r11): one real 8-bit
    RGB PNG per document (stdlib zlib/struct encoder — genuine IHDR/
    IDAT/IEND chunks with CRCs), decoded back through the real
    inflate+unfilter path inside the Arrow mapInPandas stage
    (operators/multimodal.decode_png), emitting exact integer pixel
    statistics plus an md5 over the decoded raster. The oracle replays
    stats and digest from the document text alone, so a hash match
    proves the compression round-trip preserved every pixel — removing
    the 'uncompressed-only' qualifier from the multimodal story; since
    r12 baseline JPEG is real too, leaving only MP3/H.264 behind the
    documented NotImplementedError."""
    assets = multimodal.png_assets_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    return multimodal.png_roundtrip(assets)


# JPEG round-trip oracle (r12): the LOSSY-codec leg. The fixture raster
# is gray (R=G=B) constant 8x8-aligned columns from the text digest, and
# the encoder uses the DC-exact quant tables (q[0]=8), which together
# make the whole lossy pipeline bit-exact (see jpeg_fixture_raster) — so
# the oracle replays the DECODED raster digest and exact pixel stats
# from document text alone. Width 125 and heights 5/13 force encoder
# edge-padding and decoder cropping on both axes. A hash match proves
# Huffman coding, quantization, DCT/IDCT, and the JFIF color transform
# all inverted exactly where the math says they must.
@register(
    "media_jpeg_features",
    oracle="""
WITH d AS (
  SELECT doc_id, md5(text) AS hx, 8 * (doc_id % 2 + 1) - 3 AS h
  FROM documents),
b AS (
  SELECT doc_id, h, i, substr(hx, 2*i+1, 2) AS bh,
         CASE WHEN i = 15 THEN 5 ELSE 8 END AS npx
  FROM d, range(0, 16) g(i)),
s AS (
  SELECT doc_id, h,
    SUM(npx * CAST(('0x' || bh) AS INTEGER)) AS wsum,
    MIN(CAST(('0x' || bh) AS INTEGER)) AS mn,
    MAX(CAST(('0x' || bh) AS INTEGER)) AS mx,
    string_agg(repeat(bh, 3*npx), '' ORDER BY i) AS row_hex
  FROM b GROUP BY doc_id, h)
SELECT doc_id AS asset_id,
  CAST(125 AS INT) AS width,
  CAST(h AS INT) AS height,
  CAST(125 * h AS INT) AS n_pixels,
  CAST(3 * h * wsum AS BIGINT) AS sum_byte,
  CAST(mn AS INT) AS min_byte,
  CAST(mx AS INT) AS max_byte,
  md5(repeat(row_hex, h)) AS raster_digest
FROM s
""",
    tags=("llm", "multimodal"),
)
def media_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSY image codec UN-FAKED end-to-end (r12): one real baseline
    JPEG per document through the full T.81 encoder (JFIF color
    transform, vectorized DCT, quantization, canonical Huffman), decoded
    back through the real entropy-decode + IDCT path inside the Arrow
    mapInPandas stage (operators/multimodal.decode_jpeg), emitting exact
    integer pixel statistics plus an md5 over the decoded raster. The
    fixtures are constructed where lossy == lossless (constant blocks ×
    DC-exact tables), so the DuckDB oracle replays every decoded byte
    from the text digest alone; only MP3/H.264 now remain behind the
    documented NotImplementedError."""
    assets = multimodal.jpeg_assets_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    return multimodal.jpeg_roundtrip(assets)


# Header-only triage oracle (r12): dims + component count + the
# inverted IJG quality estimate, all recoverable from the first few
# hundred payload bytes with NO entropy decode — the pre-decode filter
# a 100 TB curation pass runs before paying raster cost (measured
# ~19000x cheaper than a full decode on a 512x512 asset). The fixture
# encoder uses the DC-exact tables (Annex K with q[0]=8), whose
# unclamped-median inversion is exactly quality 50.
@register(
    "media_jpeg_header_scan",
    oracle="""
SELECT doc_id AS asset_id,
  CAST(125 AS INT) AS width,
  CAST(8 * (doc_id % 2 + 1) - 3 AS INT) AS height,
  CAST(3 AS INT) AS n_components,
  CAST(50.0 AS DOUBLE) AS quality_est
FROM documents
""",
    tags=("llm", "multimodal"),
)
def media_jpeg_header_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media triage (r12): every JPEG asset's dimensions,
    component count, and IJG quality estimate read from the marker
    stream alone (operators/multimodal.jpeg_header_scan — DQT inversion
    against the Annex K bases, unclamped-coefficient median), inside one
    Arrow mapInPandas stage that never runs the entropy decoder. The
    oracle replays the fixture geometry and the provable quality-50
    inversion from doc_id alone."""
    assets = multimodal.jpeg_assets_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    return multimodal.jpeg_header_triage(assets)


# MP3 triage oracle (r13): the audio twin of media_jpeg_header_scan —
# MP3 DECODE is library-bound (documented NotImplementedError), but the
# 4-byte MPEG frame headers give version/layer/bitrate/sample-rate and,
# walking the frame chain, an exact frame count + duration estimate at
# marker-walk cost. The fixture synthesizer derives every header field
# from (doc_id, length(text)) with integer arithmetic, so the oracle
# replays the full triage row — including the frame-length walk
# (144*bitrate//rate) — from the documents table alone.
@register(
    "media_mp3_header_scan",
    oracle="""
WITH p AS (
  SELECT doc_id,
    list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
                 CAST(1 + doc_id % 14 AS INT)) AS kbps,
    list_extract([44100,48000,32000], CAST(1 + doc_id % 3 AS INT)) AS rate,
    2 + LENGTH(text) % 7 AS n_frames
  FROM documents)
SELECT doc_id AS asset_id,
  'MPEG1' AS version,
  CAST(3 AS INT) AS layer,
  CAST(rate AS INT) AS sample_rate,
  CAST(n_frames AS INT) AS n_frames,
  CAST(kbps AS INT) AS bitrate_kbps,
  CAST(n_frames * (144 * kbps * 1000 // rate) AS INT) AS payload_bytes,
  CAST(n_frames * 1152 * 1000 // rate AS BIGINT) AS duration_ms
FROM p
""",
    tags=("llm", "multimodal"),
    extra=True,
)
def media_mp3_header_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only AUDIO triage (r13): every MP3 asset's MPEG
    version, layer, sample rate, frame count, bitrate, and integer-math
    duration estimate read by walking the 4-byte frame headers alone
    (operators/multimodal.mp3_header_scan) inside one Arrow mapInPandas
    stage — no audio decode exists or is needed for the triage decision.
    Completes triage-before-decode for every modality: images decode
    for real, audio/video that stay library-bound still get filtered at
    header cost before a deployment-time decoder is paid."""
    assets = multimodal.mp3_assets_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    return multimodal.mp3_header_triage(assets)


# MP4 triage oracle (r13): the VIDEO twin — H.264 bitstream decode is
# library-bound, but the ISO-BMFF container (14496-12 box tree) carries
# brand, movie duration, per-track handler/fourcc, and the video
# track's presentation dims in its first few hundred bytes. The fixture
# containers derive every field from (doc_id, length(text)) at
# timescale 600, so the oracle replays the whole triage row including
# the duration conversion (units*1000//timescale = exact whole seconds).
@register(
    "media_mp4_header_scan",
    oracle="""
SELECT doc_id AS asset_id,
  'isom' AS major_brand,
  CAST(600 AS INT) AS timescale,
  CAST((1 + LENGTH(text) % 10) * 1000 AS BIGINT) AS duration_ms,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS INT) AS n_tracks,
  'avc1' AS video_codec,
  CAST(16 * (1 + doc_id % 4) AS INT) AS width,
  CAST(16 * (1 + doc_id % 3) AS INT) AS height,
  CASE WHEN doc_id % 2 = 0 THEN 'mp4a' ELSE NULL END AS audio_codec
FROM documents
""",
    tags=("llm", "multimodal"),
    extra=True,
)
def media_mp4_header_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only VIDEO triage (r13): every MP4 asset's brand, movie
    duration, track count, codec fourccs, and video presentation dims
    read by walking the ISO base-media box tree alone
    (operators/multimodal.mp4_header_scan) inside one Arrow mapInPandas
    stage — no bitstream decode exists or is needed for the triage
    decision. With jpeg_header_scan (image) and mp3_header_scan (audio)
    this closes triage-before-decode across all modalities: dims,
    duration, and codec are filterable at header cost for the formats
    whose full decoders stay deployment-substituted."""
    assets = multimodal.mp4_assets_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    return multimodal.mp4_header_triage(assets)


# Dispatching image triage (r13): real corpora MIX formats in one
# binary column, so the pre-decode filter must read dims at header cost
# for whichever codec each payload is. The fixture corpus rotates
# PPM/PNG/JPEG by doc_id%3 with each format's standard geometry, so the
# oracle replays format, dims, and the JPEG-only quality estimate from
# doc_id alone.
@register(
    "media_image_header_scan",
    oracle="""
SELECT doc_id AS asset_id,
  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'ppm' WHEN 1 THEN 'png'
       ELSE 'jpeg' END AS format,
  CAST(CASE WHEN doc_id % 3 = 2 THEN 125 ELSE 16 END AS INT) AS width,
  CAST(CASE WHEN doc_id % 3 = 2 THEN 8 * (doc_id % 2 + 1) - 3
            ELSE doc_id % 4 + 1 END AS INT) AS height,
  CAST(3 AS INT) AS n_components,
  CASE WHEN doc_id % 3 = 2 THEN CAST(50.0 AS DOUBLE)
       ELSE CAST(NULL AS DOUBLE) END AS quality_est
FROM documents
""",
    tags=("llm", "multimodal"),
    extra=True,
)
def media_image_header_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispatching image triage over a HETEROGENEOUS corpus (r13): one
    mixed PPM/PNG/JPEG binary column triaged by magic-byte dispatch
    (operators/multimodal.image_header_scan — P6 header grammar, PNG
    IHDR with CRC, JPEG marker walk + DQT quality inversion) inside one
    Arrow mapInPandas stage, no decode. Each per-format scanner
    enforces exactly its decoder's supported subset, so this gate never
    admits a payload the decode stage would reject."""
    assets = multimodal.mixed_image_assets_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    return multimodal.image_header_triage(assets)


# Cross-modality triage manifest (r13): the end deliverable the three
# header scans exist for — ONE keep/drop manifest over a mixed-media
# corpus, decided entirely at header cost (image: dims x quality;
# audio: bitrate x duration; video: dims x duration). At 100 TB this is
# the row set that gates which payloads ever reach a decoder; each
# modality's columns are replayed by the oracle from the same
# (doc_id, length(text)) arithmetic as its standalone triage query.
@register(
    "media_triage_manifest",
    oracle="""
SELECT doc_id AS asset_id, 'image' AS modality, 'jpeg' AS codec,
  CAST(125 AS INT) AS width,
  CAST(8 * (doc_id % 2 + 1) - 3 AS INT) AS height,
  CAST(NULL AS BIGINT) AS duration_ms,
  CAST(50.0 AS DOUBLE) AS quality,
  (125 * (8 * (doc_id % 2 + 1) - 3) >= 1000) AS keep
FROM documents
UNION ALL
SELECT doc_id, 'audio', 'mp3',
  CAST(NULL AS INT), CAST(NULL AS INT),
  CAST((2 + LENGTH(text) % 7) * 1152 * 1000
       // list_extract([44100,48000,32000], CAST(1 + doc_id % 3 AS INT))
       AS BIGINT),
  CAST(list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
                    CAST(1 + doc_id % 14 AS INT)) AS DOUBLE),
  (list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
                CAST(1 + doc_id % 14 AS INT)) >= 64
   AND (2 + LENGTH(text) % 7) * 1152 * 1000
       // list_extract([44100,48000,32000], CAST(1 + doc_id % 3 AS INT))
       >= 100)
FROM documents
UNION ALL
SELECT doc_id, 'video', 'avc1',
  CAST(16 * (1 + doc_id % 4) AS INT),
  CAST(16 * (1 + doc_id % 3) AS INT),
  CAST((1 + LENGTH(text) % 10) * 1000 AS BIGINT),
  CAST(NULL AS DOUBLE),
  (16 * (1 + doc_id % 4) >= 32 AND 16 * (1 + doc_id % 3) >= 32
   AND (1 + LENGTH(text) % 10) * 1000 <= 8000)
FROM documents
""",
    tags=("llm", "multimodal"),
    extra=True,
)
def media_triage_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One keep/drop manifest across ALL modalities at header cost
    (r13): JPEG dims+quality, MP3 bitrate+duration, and MP4
    dims+duration triage rows normalized to a common schema and
    unioned, with per-modality keep predicates — the pre-decode gate a
    mixed 100 TB corpus runs before any payload reaches a decoder.
    Three metadata-projection scans, zero shuffles, zero decodes."""
    return triage_manifest_over(load_table(spark, sf_dir, "documents"))


def triage_manifest_over(docs: DataFrame) -> DataFrame:
    """The manifest composition over an arbitrary documents frame
    (shared by the registered query and the scale sweep)."""
    null_i = F.lit(None).cast("int")
    img = multimodal.jpeg_header_triage(
        multimodal.jpeg_assets_from_documents(docs)
    ).select(
        "asset_id",
        F.lit("image").alias("modality"),
        F.lit("jpeg").alias("codec"),
        "width",
        "height",
        F.lit(None).cast("long").alias("duration_ms"),
        F.col("quality_est").alias("quality"),
        ((F.col("width") * F.col("height") >= 1000)).alias("keep"),
    )
    aud = multimodal.mp3_header_triage(
        multimodal.mp3_assets_from_documents(docs)
    ).select(
        "asset_id",
        F.lit("audio").alias("modality"),
        F.lit("mp3").alias("codec"),
        null_i.alias("width"),
        null_i.alias("height"),
        "duration_ms",
        F.col("bitrate_kbps").cast("double").alias("quality"),
        (
            (F.col("bitrate_kbps") >= 64) & (F.col("duration_ms") >= 100)
        ).alias("keep"),
    )
    vid = multimodal.mp4_header_triage(
        multimodal.mp4_assets_from_documents(docs)
    ).select(
        "asset_id",
        F.lit("video").alias("modality"),
        F.col("video_codec").alias("codec"),
        "width",
        "height",
        "duration_ms",
        F.lit(None).cast("double").alias("quality"),
        (
            (F.col("width") >= 32)
            & (F.col("height") >= 32)
            & (F.col("duration_ms") <= 8000)
        ).alias("keep"),
    )
    return img.unionByName(aud).unionByName(vid)


# Cross-codec transcode oracle (r12): lossy JPEG in, lossless PNG out —
# the format-normalization shape of a real curation pipeline. The
# nearest-neighbor gather picks source columns ((2j+1)*125)//16 for
# j<8; every fixture row is identical, so the resampled raster is the
# selected digest bytes tripled per pixel, repeated 8 rows — fully
# SQL-replayable. A match proves JPEG decode -> resample -> PNG encode
# -> PNG decode added zero generation loss.
@register(
    "media_transcode_jpeg_png",
    oracle="""
WITH d AS (SELECT doc_id, md5(text) AS hx FROM documents),
b AS (
  SELECT doc_id, j,
    substr(hx, 2 * ((((2*j+1) * 125) // 16) // 8) + 1, 2) AS bh
  FROM d, range(0, 8) g(j))
SELECT doc_id AS asset_id,
  CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
  CAST(64 AS INT) AS n_pixels,
  CAST(8 * 3 * SUM(CAST(('0x' || bh) AS INTEGER)) AS BIGINT) AS sum_byte,
  CAST(MIN(CAST(('0x' || bh) AS INTEGER)) AS INT) AS min_byte,
  CAST(MAX(CAST(('0x' || bh) AS INTEGER)) AS INT) AS max_byte,
  md5(repeat(string_agg(repeat(bh, 3), '' ORDER BY j), 8)) AS raster_digest
FROM b GROUP BY doc_id
""",
    tags=("llm", "multimodal"),
)
def media_transcode_jpeg_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-codec pipeline UN-FAKED end-to-end (r12): baseline JPEG
    assets decoded through the real Huffman+IDCT path, resampled with
    the shared exact-integer nearest-neighbor gather, re-encoded as
    LOSSLESS PNG inside one Arrow mapInPandas stage
    (operators/multimodal.transcode_resize_images), then decoded AGAIN
    by png_roundtrip for stats + the raster digest the DuckDB oracle
    replays from document text alone. Mixed-format in, one archival
    format out — the normalization stage of a training-data pipeline,
    proven to add zero generation loss."""
    assets = multimodal.jpeg_assets_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    return multimodal.png_roundtrip(
        multimodal.transcode_resize_images(assets, 8, 8)
    )


# PNG resize oracle (r11): the COMPRESSED twin of media_resize_ppm —
# same exact-integer nearest-neighbor index arithmetic over the
# digest-cycled source raster, but the digest is over the DECODED
# resized raster (PNG payload bytes depend on the zlib encoder; the
# pixels do not). A match proves decode → resample → re-encode →
# re-decode preserved every target pixel through DEFLATE twice.
@register(
    "media_resize_png",
    oracle=f"""
WITH d AS (
  SELECT doc_id, md5(text) AS hx, doc_id % 4 + 1 AS h FROM documents),
b AS (
  SELECT d.doc_id, p.p,
    substr(d.hx,
      2 * ((((((2 * (p.p // 24) + 1) * d.h) // 16) * 16
            + (2 * ((p.p % 24) // 3) + 1)) * 3 + p.p % 3) % 16) + 1,
      2) AS hb
  FROM d, range(0, {_RP_RASTER}) p(p))
SELECT doc_id AS asset_id,
  CAST({_RPW} AS INT) AS width, CAST({_RPH} AS INT) AS height,
  CAST({_RPW * _RPH} AS INT) AS n_pixels,
  CAST(SUM(CAST(('0x' || hb) AS INTEGER)) AS BIGINT) AS sum_byte,
  CAST(MIN(CAST(('0x' || hb) AS INTEGER)) AS INT) AS min_byte,
  CAST(MAX(CAST(('0x' || hb) AS INTEGER)) AS INT) AS max_byte,
  md5(string_agg(hb, '' ORDER BY p)) AS raster_digest
FROM b GROUP BY doc_id
""",
    tags=("llm", "multimodal"),
    extra=True,
)
def media_resize_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED-image resize UN-FAKED end-to-end: PNG assets through
    decode (inflate+unfilter) → exact-integer nearest-neighbor gather →
    PNG re-encode inside the Arrow mapInPandas stage (fake=False), then
    decoded AGAIN by png_roundtrip to emit pixel stats + the raster
    digest the DuckDB oracle replays from document text alone. The
    resample arithmetic is byte-identical to media_resize_ppm's — what
    this adds is proof the whole pipeline survives a genuinely
    compressed container in both directions."""
    assets = multimodal.png_assets_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    resized = multimodal.resize_images(assets, _RPW, _RPH, fake=False)
    return multimodal.png_roundtrip(resized)


@register(
    "media_video_y4m_frames",
    oracle=f"""
WITH d AS (
  SELECT doc_id, text, 2 + doc_id % 4 AS n FROM documents),
sampled AS (
  SELECT doc_id, text, n,
         UNNEST(generate_series(0, n - 1, 2)) AS fi
  FROM d)
SELECT doc_id AS asset_id,
  CAST(n AS BIGINT) AS n_frames,
  CAST(fi AS BIGINT) AS frame_index,
  CAST({len(multimodal.Y4M_HEADER)}
       + n * {6 + multimodal.Y4M_FRAME_BYTES} AS BIGINT) AS payload_bytes,
  md5(repeat(md5(text || '-f' || CAST(fi AS VARCHAR)),
             {multimodal.Y4M_FRAME_BYTES // 16})) AS frame_digest
FROM sampled
""",
    tags=("llm", "multimodal", "video"),
)
def media_video_y4m_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video leg UN-FAKED end-to-end (r10): one REAL YUV4MPEG2 clip per
    document (uncompressed C444 frames — the mjpegtools/ffmpeg raw video
    container), decoded and frame-sampled through the real parser inside
    the Arrow mapInPandas stage (every 2nd frame incl. frame 0). The
    oracle replays header arithmetic and per-frame digests from the
    document text alone, so a hash match proves the container round-trip
    preserved every raster byte. With PPM, WAV, and Y4M all running
    fake=False, every UNcompressed modality is real; with PNG (r11) and
    baseline JPEG (r12) the compressed image formats are too — only
    MP3/H.264 stay behind the documented NotImplementedError."""
    assets = multimodal.y4m_assets_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    return multimodal.sample_frames(assets, every_n=2)


_CHUNK, _OVERLAP = 32, 8
_STEP = _CHUNK - _OVERLAP


# Like SHINGLES_SQL, the oracle cross-joins a bounded range because DuckDB
# 1.0 cannot lateral-join a column-dependent generate_series: 1024 chunk
# slots cover documents up to ~24k words (testdata documents are ≤ ~100).
@register(
    "doc_chunks",
    oracle=f"""
WITH wordarrs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id, CAST(i AS INT) AS chunk_id,
  array_to_string(ws[(i*{_STEP}+1):(i*{_STEP}+{_CHUNK})], ' ') AS chunk_text,
  CAST(len(ws[(i*{_STEP}+1):(i*{_STEP}+{_CHUNK})]) AS INT) AS chunk_words
FROM wordarrs, range(0, 1024) s(i)
WHERE i*{_STEP} <= greatest(len(ws) - {_OVERLAP} - 1, 0)
""",
    tags=("llm", "text", "chunking"),
    extra=True,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping word-window chunking (context-window packing unit)."""
    return text.chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_words=_CHUNK, overlap_words=_OVERLAP
    )


@register(
    "tfidf_top_terms",
    oracle="""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
idf AS (
  SELECT term, ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / COUNT(*)) AS idf
  FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term, round(tf.tf * idf.idf, 6) AS tfidf
  FROM tf JOIN idf USING (term))
SELECT doc_id, term_rank, term, tfidf FROM (
  SELECT doc_id, term, tfidf,
    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS term_rank
  FROM scored) t
WHERE term_rank <= 5
""",
    tags=("llm", "text", "tfidf"),
    extra=True,
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document (corpus characterization)."""
    return text.tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=5)


# Composition pipeline: chunk → per-chunk quality filter → exact dedup.
# This is the canonical LLM training-data shape (context-window packing,
# then quality gating, then dedup at the chunk grain); one oracle pins the
# composed semantics, not just each stage in isolation.
_CHUNK_PIPE_SQL = rf"""
WITH wordarrs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
chunks AS (
  SELECT doc_id * 1024 + i AS chunk_key,
    array_to_string(ws[(i*{_STEP}+1):(i*{_STEP}+{_CHUNK})], ' ') AS text
  FROM wordarrs, range(0, 1024) s(i)
  WHERE i*{_STEP} <= greatest(len(ws) - {_OVERLAP} - 1, 0)),
nonempty AS (SELECT chunk_key, text FROM chunks WHERE length(text) > 0),
m AS (
  SELECT chunk_key, text,
    length(text) AS n_chars,
    len(string_split(text, ' ')) AS n_words,
    len(list_filter(string_split(text, ' '),
        w -> list_contains([{{stopwords}}], w))) AS stop_hits,
    length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
  FROM nonempty),
keep AS (
  SELECT chunk_key, text FROM m
  WHERE round(
      CAST(stop_hits AS DOUBLE) / n_words * 0.5
      + CASE WHEN CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words
             BETWEEN 3 AND 10 THEN 0.3 ELSE 0.0 END
      + CASE WHEN CAST(n_punct AS DOUBLE) / n_chars <= 0.1
             THEN 0.2 ELSE 0.0 END, 6) >= 0.3),
norm AS (
  SELECT chunk_key,
    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash
  FROM keep)
SELECT content_hash, MIN(chunk_key) AS canonical_chunk,
  COUNT(*) AS n_duplicates
FROM norm GROUP BY 1
"""


@register(
    "llm_chunk_quality_dedup",
    oracle=_CHUNK_PIPE_SQL.format(stopwords=_EN_STOPWORDS),
    tags=("llm", "text", "dedup", "pipeline"),
    extra=True,
)
def llm_chunk_quality_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end chunk-grain pipeline: overlapping 32/8 word chunks →
    quality score per chunk → keep score ≥ 0.3 → exact dedup over the
    surviving chunks. Chunk keys are doc_id*1024 + chunk_id (chunk counts
    are bounded by the chunker's 1024-slot window in both engines). Extra
    registry: locally oracle-verified."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = text.chunk_documents(docs, chunk_words=_CHUNK, overlap_words=_OVERLAP)
    keyed = chunks.filter(F.length("chunk_text") > 0).select(
        (F.col("doc_id") * 1024 + F.col("chunk_id")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    good = text.text_metrics(keyed).filter(F.col("quality_score") >= 0.3)
    keep = keyed.join(good.select("doc_id"), "doc_id", "left_semi")
    groups = dedup.exact_dedup_groups(keep)
    return groups.select(
        "content_hash",
        F.col("canonical_doc_id").alias("canonical_chunk"),
        "n_duplicates",
    )


# Split boundaries are computed in Python (int() truncates) and inlined as
# exact literals: DuckDB's float→BIGINT cast ROUNDS, so `CAST(0.8 * 2^32
# AS BIGINT)` lands one above Spark's boundary and flips the split of any
# bucket exactly on it.
_TRAIN_HI = int(0.8 * (1 << 32))
_VAL_HI = int(0.9 * (1 << 32))


@register(
    "train_val_split",
    oracle=f"""
WITH b AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      AS bucket
  FROM documents)
SELECT doc_id, bucket,
  CASE WHEN bucket < {_TRAIN_HI} THEN 'train'
       WHEN bucket < {_VAL_HI} THEN 'val'
       ELSE 'test' END AS split
FROM b
""",
    tags=("llm", "sampling"),
    extra=True,
)
def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test assignment by doc-id hash —
    stable under repartition, re-run, and incremental appends (no RNG;
    Spark's randomSplit is partitioning-dependent and un-oracle-able)."""
    return sampling.hash_split(load_table(spark, sf_dir, "documents"))


@register(
    "stratified_sample_lang",
    oracle="""
SELECT lang, doc_id, sample_rank FROM (
  SELECT lang, doc_id,
    row_number() OVER (
      PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
  FROM documents) t
WHERE sample_rank <= 20
""",
    tags=("llm", "sampling"),
    extra=True,
)
def stratified_sample_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20-docs-per-language sample: hash order is a
    reproducible shuffle, identical across engines and cluster layouts."""
    return sampling.stratified_sample(
        load_table(spark, sf_dir, "documents"), ["lang"], k=20
    )


# DuckDB regular single-quoted strings pass backslashes through verbatim,
# so the Java-side patterns drop in unchanged.
_EMAIL_SQL = text.EMAIL_REGEX
_PHONE_SQL = text.PHONE_REGEX


@register(
    "pii_redaction",
    oracle=f"""
WITH contactful AS (
  SELECT doc_id,
    text || ' Contact user' || CAST(doc_id AS VARCHAR)
         || '@example.com or +1-555-'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents)
SELECT doc_id,
  regexp_replace(
    regexp_replace(text, '{_EMAIL_SQL}', '[EMAIL]', 'g'),
    '{_PHONE_SQL}', '[PHONE]', 'g') AS clean_text,
  CAST(len(regexp_extract_all(text, '{_EMAIL_SQL}')) AS BIGINT)
    AS n_emails,
  CAST(len(regexp_extract_all(
    regexp_replace(text, '{_EMAIL_SQL}', '[EMAIL]', 'g'),
    '{_PHONE_SQL}')) AS BIGINT)
    AS n_phones
FROM contactful
""",
    tags=("llm", "text", "privacy"),
    extra=True,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training privacy pass: email/phone scrubbing with match counts.
    The corpus is synthetic and PII-free, so the query plants one email and
    one phone per document (derived from doc_id — deterministic in both
    engines) to prove the redaction actually fires."""
    docs = load_table(spark, sf_dir, "documents")
    contactful = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return text.redact_pii(contactful)


@register(
    "chunk_window_packing",
    oracle=f"""
WITH wordarrs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
chunks AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_id,
    CAST(len(ws[(i*{_STEP}+1):(i*{_STEP}+{_CHUNK})]) AS INT) AS chunk_words
  FROM wordarrs, range(0, 1024) s(i)
  WHERE i*{_STEP} <= greatest(len(ws) - {_OVERLAP} - 1, 0))
SELECT doc_id, chunk_id, chunk_words,
  CAST(COALESCE(SUM(chunk_words) OVER (
    PARTITION BY doc_id ORDER BY chunk_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
    AS word_offset,
  CAST(FLOOR(COALESCE(SUM(chunk_words) OVER (
    PARTITION BY doc_id ORDER BY chunk_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 128.0) AS INT)
    AS window_id
FROM chunks
""",
    tags=("llm", "text", "chunking"),
    extra=True,
)
def chunk_window_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: chunks assigned to fixed 128-word training
    windows by cumulative offset within each document — the declarative,
    per-doc-parallel packing form."""
    chunks = text.chunk_documents(
        load_table(spark, sf_dir, "documents"),
        chunk_words=_CHUNK,
        overlap_words=_OVERLAP,
    )
    return text.pack_chunks_into_windows(chunks, window_tokens=128)


@register(
    "repetition_metrics",
    oracle=f"""
WITH {SHINGLES_SQL},
terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS c FROM terms GROUP BY 1, 2),
pd AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
    COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS top_tf
  FROM tf GROUP BY 1),
sh3 AS (SELECT doc_id, COUNT(*) AS n3 FROM shingles GROUP BY 1)
SELECT pd.doc_id AS doc_id, n_words, n_distinct,
  round(CAST(n_distinct AS DOUBLE) / n_words, 6) AS distinct_ratio,
  round(CAST(top_tf AS DOUBLE) / n_words, 6) AS top_word_frac,
  CASE WHEN n_words >= 3
       THEN round(1 - CAST(n3 AS DOUBLE) / (n_words - 2), 6) END
    AS dup_3gram_frac
FROM pd LEFT JOIN sh3 ON pd.doc_id = sh3.doc_id
""",
    tags=("llm", "text", "quality"),
    extra=True,
)
def repetition_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: distinct-word ratio, top-word mass,
    duplicate-3-gram fraction."""
    return text.repetition_metrics(load_table(spark, sf_dir, "documents"))


# Resize-stub math the oracle can replay in hex-string space: the fake
# resample is md5(payload) digest bytes repeated to width*height*3, so the
# hex of the resized payload is repeat(md5_hex, ceil(len/16)) truncated to
# 2*len chars — md5 over THAT STRING is computable in both engines
# (DuckDB 1.0 has no blob md5/substring; hex strings sidestep it).
_RW, _RH = 8, 8
_ROUT = _RW * _RH * 3
_RREPS = -(-_ROUT // 16)


@register(
    "media_resize",
    oracle=f"""
SELECT doc_id AS asset_id, {_RW} AS width, {_RH} AS height,
  CASE WHEN text IS NULL THEN NULL ELSE CAST({_ROUT} AS BIGINT) END
    AS payload_bytes,
  CASE WHEN text IS NULL THEN NULL
       ELSE md5(substr(repeat(md5(text), {_RREPS}), 1, {2 * _ROUT})) END
    AS payload_digest
FROM documents WHERE doc_id % 3 = 0
""",
    tags=("llm", "multimodal"),
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize stage end-to-end: image assets through the
    Arrow-batched mapInPandas resize stub, verified by recomputing the
    digest-seeded output bytes in SQL."""
    assets = multimodal.media_from_documents(load_table(spark, sf_dir, "documents"))
    resized = multimodal.resize_images(assets, _RW, _RH)
    return resized.select(
        "asset_id",
        "width",
        "height",
        "payload_bytes",
        F.md5(F.lower(F.hex("payload")).cast("binary")).alias("payload_digest"),
    )


# Clusters over the exact-Jaccard pair graph. The recursive CTE computes,
# for every node, the set of labels reachable through the (symmetrized)
# edge list; MIN over that set is the component's canonical id — exactly
# the fixpoint the iterative min-label propagation converges to.
_CLUSTERS_SQL = f"""
WITH RECURSIVE {SHINGLES_SQL},
capped AS (
  SELECT doc_id, shingle FROM shingles
  QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= {dedup.DEFAULT_MAX_SHINGLE_DF}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach AS (
  SELECT s AS node, s AS lbl FROM edges
  UNION
  SELECT e.s, r.lbl FROM edges e JOIN reach r ON e.d = r.node)
SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
"""


@register(
    "dedup_clusters",
    oracle=_CLUSTERS_SQL,
    tags=("llm", "dedup", "graph"),
    extra=True,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the exact-Jaccard
    pair graph by iterative min-label propagation — the keep/drop grouping
    step that turns pairwise dedup evidence into one canonical document
    per component. Oracle is the transitive-closure recursive CTE. Extra
    registry: locally oracle-verified."""
    pairs = dedup.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), 0.5)
    return dedup.duplicate_clusters(pairs)


# Semantic clusters: the same transitive-closure oracle as dedup_clusters,
# but over the embedding-cosine pair graph — proving duplicate_clusters
# composes with BOTH similarity families (lexical shingles and embeddings).
_EMB_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE {COSINE_SQL} >= 0.45),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach AS (
  SELECT s AS node, s AS lbl FROM edges
  UNION
  SELECT e.s, r.lbl FROM edges e JOIN reach r ON e.d = r.node)
SELECT node AS vec_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
"""


@register(
    "embedding_dup_clusters_exact",
    oracle=_EMB_CLUSTERS_SQL,
    tags=("llm", "dedup", "similarity", "graph"),
    extra=True,
)
def embedding_dup_clusters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-duplicate CLUSTERS over the EXACT all-pairs cosine
    graph (cosine ≥ 0.45) — since round 5 the O(N²) exactness baseline
    for the canonical ``embedding_dup_clusters`` (whose pair stage is
    LSH-bucketed). Uses the same pointer-jumping min-label propagation."""
    pairs = similarity.embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), 0.45
    ).select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    return dedup.duplicate_clusters(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


# Shared replay of the deterministic LSH bucket pipeline: same anchor
# hyperplanes, same sign-pattern buckets. Consumed by the near-dup pair
# oracle (undirected candidates + threshold verify) AND the k-NN label
# vote oracle (directed candidates + rank/vote tail) — the approximation
# is part of each contract, so the oracles reproduce it exactly.
_LSH_BUCKETS_SQL = """
alist AS (
  SELECT list(CAST(embedding AS DOUBLE[]) ORDER BY vec_id) AS anchors
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 24)),
ebits AS (
  SELECT e.vec_id,
    list_transform(al.anchors,
      x -> CASE WHEN list_dot_product(x, CAST(e.embedding AS DOUBLE[])) > 0
           THEN 1 ELSE 0 END) AS bits
  FROM embeddings e, alist al),
ebuckets AS (
  SELECT vec_id, t.t AS tbl,
    bits[t.t*3+1]*4 + bits[t.t*3+2]*2 + bits[t.t*3+3] AS bucket
  FROM ebits, range(0, 8) t(t))"""

_LSH_PAIRS_CORE = f"""
{_LSH_BUCKETS_SQL},
lshcand AS (
  SELECT DISTINCT x.vec_id AS doc_a, y.vec_id AS doc_b
  FROM ebuckets x JOIN ebuckets y USING (tbl, bucket)
  WHERE x.vec_id < y.vec_id),
lshpairs AS (
  SELECT doc_a, doc_b, {COSINE_SQL} AS cosine_sim
  FROM lshcand
  JOIN embeddings a ON doc_a = a.vec_id
  JOIN embeddings b ON doc_b = b.vec_id
  WHERE {COSINE_SQL} >= 0.45)
"""


@register(
    "embedding_near_dup",
    oracle=f"""
WITH {_LSH_PAIRS_CORE}
SELECT doc_a AS vec_a, doc_b AS vec_b, cosine_sim FROM lshpairs
""",
    tags=("llm", "dedup", "similarity"),
    extra=True,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup pairs, scale path (PUBLIC since round 5 — was
    ``embedding_near_dup_lsh``): LSH bucket self-join candidates + exact
    cosine verification (cosine ≥ 0.45). Cost is O(corpus + candidates),
    not all-pairs; the O(N²) form is the *(extra)*
    ``embedding_near_dup_exact`` baseline (measured recall vs it lives in
    tests/test_similarity.py). Deterministic pipeline → the oracle replays
    candidates AND verification, approximation included."""
    return similarity.lsh_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), 0.45,
        n_tables=8, bits_per_table=3,
    )


@register(
    "embedding_dup_clusters",
    oracle=f"""
WITH RECURSIVE {_LSH_PAIRS_CORE},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM lshpairs
  UNION SELECT doc_b, doc_a FROM lshpairs),
reach AS (
  SELECT s AS node, s AS lbl FROM edges
  UNION
  SELECT e.s, r.lbl FROM edges e JOIN reach r ON e.d = r.node)
SELECT node AS vec_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
""",
    tags=("llm", "dedup", "similarity", "graph"),
    extra=True,
)
def embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical semantic dedup pipeline (LSH-routed since round 5 —
    was ``embedding_dup_clusters_lsh``): LSH-bucketed candidate pairs
    (exact-verified) → pointer-jumping connected components. Every stage
    is corpus-linear-ish (bucket self-join + O(log d) label rounds) —
    this is the plan you'd run at 100 TB, with
    ``embedding_dup_clusters_exact`` as its O(N²) exactness baseline."""
    pairs = similarity.lsh_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), 0.45,
        n_tables=8, bits_per_table=3,
    ).select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    return dedup.duplicate_clusters(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


# Incremental (delta-vs-corpus) near-dup: base = doc_id % 10 != 0,
# delta = doc_id % 10 = 0. base ∪ delta = documents, so the capped
# shingle universe equals the full operator's — the oracle is the full
# pairwise Jaccard restricted to mixed pairs, oriented delta-first.
@register(
    "dedup_incremental_vs_corpus",
    oracle=f"""
WITH {SHINGLES_SQL},
capped AS (
  SELECT doc_id, shingle FROM shingles
  QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= {dedup.DEFAULT_MAX_SHINGLE_DF}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b,
    CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard
  FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5)
SELECT CASE WHEN doc_a % 10 = 0 THEN doc_a ELSE doc_b END AS doc_new,
       CASE WHEN doc_a % 10 = 0 THEN doc_b ELSE doc_a END AS doc_base,
       jaccard
FROM pairs
WHERE (doc_a % 10 = 0) <> (doc_b % 10 = 0)
""",
    tags=("llm", "dedup", "incremental"),
)
def dedup_incremental_vs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: near-dups of a NEW batch (doc_id % 10 = 0)
    against the EXISTING corpus (the rest) — bucket join is delta×base,
    so the quadratic base×base term never exists. This is how a daily
    crawl batch dedups against a 100 TB corpus whose signatures are a
    precomputed table.

    Oracle soundness: the oracle is the exact pairwise Jaccard restricted
    to mixed pairs, while the operator emits only LSH-colliding candidates
    — so the check is sound only if no true pair escapes the banding. As
    with ``dedup_minhash_lsh``, the fixture's injected near-dups sit at
    s ≈ 0.98, where P(miss) = (1−s²)^32 ≈ 1e-45 with the default banding
    (32 bands × 2 rows); a pair hovering AT the 0.5 threshold would have
    ~1e-4 miss probability, but the fixture has no such pairs —
    mixed-pair similarities are either ≥0.9 (injected dups) or ≪0.5."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    return dedup.minhash_lsh_pairs_incremental(base, delta, 0.5)


# Same delta/base split, but through the PRECOMPUTED base index path
# (build_minhash_index → minhash_lsh_pairs_vs_index). The oracle replays
# the index's pinned-cap semantics exactly: base shingles capped on
# base-only df, delta shingles capped on delta-only df AND the base hot
# list — at any SF, not just where the cap never binds. The same
# LSH-recall argument as dedup_incremental_vs_corpus applies (fixture
# near-dups at s≈0.98 → P(miss)≈1e-45).
@register(
    "dedup_incremental_precomputed",
    oracle=f"""
WITH {SHINGLES_SQL},
basesh AS (SELECT doc_id, shingle FROM shingles WHERE doc_id % 10 <> 0),
deltash AS (SELECT doc_id, shingle FROM shingles WHERE doc_id % 10 = 0),
basehot AS (
  SELECT shingle FROM basesh GROUP BY 1
  HAVING COUNT(*) > {dedup.DEFAULT_MAX_SHINGLE_DF}),
bcapped AS (
  SELECT b.doc_id, b.shingle FROM basesh b
  WHERE NOT EXISTS (SELECT 1 FROM basehot h WHERE h.shingle = b.shingle)),
dcapped AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, shingle FROM deltash
    QUALIFY COUNT(*) OVER (PARTITION BY shingle)
      <= {dedup.DEFAULT_MAX_SHINGLE_DF}) d
  WHERE NOT EXISTS (SELECT 1 FROM basehot h WHERE h.shingle = d.shingle)),
capped AS (SELECT * FROM bcapped UNION ALL SELECT * FROM dcapped),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b,
    CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard
  FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5)
SELECT CASE WHEN doc_a % 10 = 0 THEN doc_a ELSE doc_b END AS doc_new,
       CASE WHEN doc_a % 10 = 0 THEN doc_b ELSE doc_a END AS doc_base,
       jaccard
FROM pairs
WHERE (doc_a % 10 = 0) <> (doc_b % 10 = 0)
""",
    tags=("llm", "dedup", "incremental"),
    extra=True,
)
def dedup_incremental_precomputed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup against a PRECOMPUTED base index (r4 verdict
    item 3): the base corpus is shingled and signed ONCE at index-build
    time; each delta batch pays only for its own documents + the probe.
    Here the index is built in-plan (the registry callable has no side
    store); bench.py measures the real operational split — index written
    to parquet untimed, probe timed — where the delta path beats the
    full-corpus run."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    idx = dedup.build_minhash_index(base)
    return dedup.minhash_lsh_pairs_vs_index(
        idx["shingles"], idx["buckets"], idx["hot"], delta, 0.5,
        base_hot_buckets=idx["hot_buckets"],
    )


# Delta-vs-corpus EXACT dedup through the digest-index probe: one hash
# join keyed on the content digest. The operator's scale story is
# Catalyst's runtime bloom-filter injection on the index scan (pinned by
# plan test at fixture thresholds); the RESULT is threshold-free and
# exactly SQL-expressible, so the oracle is a plain left join.
@register(
    "dedup_incremental_exact",
    oracle=r"""
WITH base AS (
  SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
         MIN(doc_id) AS canonical_doc_id
  FROM documents WHERE doc_id % 10 <> 0 GROUP BY 1),
delta AS (
  SELECT doc_id,
         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash
  FROM documents WHERE doc_id % 10 = 0)
SELECT d.doc_id AS doc_id, d.content_hash AS content_hash,
       b.canonical_doc_id IS NOT NULL AS is_duplicate,
       b.canonical_doc_id AS canonical_doc_id
FROM delta d LEFT JOIN base b USING (content_hash)
""",
    tags=("llm", "dedup", "incremental"),
    extra=True,
)
def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (digest-level) delta-vs-corpus dedup: probe the precomputed
    digest index with the batch's content hashes; duplicates resolve to
    the corpus canonical. The cheap first stage every incremental ingest
    runs before near-dup LSH — most re-crawled content is byte-identical."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    return dedup.incremental_exact_dedup(
        dedup.exact_dedup_groups(base), delta
    )


# Quality-decile stratification via the DISTRIBUTED global rank (W2's
# histogram-offset operator, coarse-bucketed on floor(score*10)) — the
# corpus-curation step "keep the top-N% by quality" without a
# single-partition window anywhere in the plan.
_QUALITY_EXPR = f"""round(
      CAST(len(list_filter(string_split(text, ' '),
           w -> list_contains([{_EN_STOPWORDS}], w))) AS DOUBLE)
        / len(string_split(text, ' ')) * 0.5
      + CASE WHEN CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                  / len(string_split(text, ' ')) BETWEEN 3 AND 10
             THEN 0.3 ELSE 0.0 END
      + CASE WHEN CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                  / length(text) <= 0.1 THEN 0.2 ELSE 0.0 END, 6)"""


@register(
    "quality_deciles",
    oracle=f"""
WITH m AS (SELECT doc_id, {_QUALITY_EXPR} AS quality_score FROM documents),
r AS (
  SELECT doc_id, quality_score,
    row_number() OVER (ORDER BY quality_score, doc_id) AS quality_rank
  FROM m),
n AS (SELECT COUNT(*) AS n FROM m)
SELECT doc_id, quality_score, quality_rank,
  CAST(FLOOR((quality_rank - 1) * 10.0 / (SELECT n FROM n)) + 1 AS BIGINT)
    AS decile
FROM r
""",
    tags=("llm", "text", "quality", "sampling"),
    extra=True,
)
def quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide quality stratification: every document gets its global
    quality rank and decile (1 = worst, 10 = best) — the curation step
    behind "train on the top 30% by quality". The global rank is the
    distributed histogram-offset form (no single-partition window; the
    coarse shard is floor(score*10)), and the total count broadcasts as
    a one-row aggregate."""
    from ssg_etl_spark.cache import persist_tracked

    docs = load_table(spark, sf_dir, "documents")
    # Persisted (r13): the rank machinery consumes its input twice
    # (prefix histogram + final join) and the decile denominator adds a
    # third — unpersisted, the text_metrics regex featurization ran 3×.
    m = persist_tracked(
        text.text_metrics(docs).select("doc_id", "quality_score")
    )
    ranked = analytics.global_row_number(
        m,
        "quality_score",
        ["doc_id"],
        out_col="quality_rank",
        coarse_fn=lambda c: F.floor(F.col(c) * 10),
    )
    n = m.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    return ranked.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "quality_score",
        "quality_rank",
        (F.floor((F.col("quality_rank") - 1) * 10 / F.col("_n")) + 1)
        .cast("long")
        .alias("decile"),
    )


# Decontamination: corpus docs (doc_id % 50 != 0) sharing >= 3 distinct
# 3-gram shingles with a benchmark doc (doc_id % 50 = 0). Absolute overlap
# count, no df cap — a leaked benchmark sentence is exactly the signal.
@register(
    "benchmark_contamination",
    oracle=f"""
WITH {SHINGLES_SQL},
c AS (SELECT doc_id, shingle FROM shingles WHERE doc_id % 50 != 0),
b AS (SELECT doc_id AS bench_id, shingle FROM shingles WHERE doc_id % 50 = 0)
SELECT c.doc_id AS doc_id, b.bench_id AS bench_id, COUNT(*) AS n_shared
FROM c JOIN b USING (shingle)
GROUP BY 1, 2
HAVING COUNT(*) >= 3
""",
    tags=("llm", "dedup", "contamination"),
    extra=True,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination pass: training-corpus documents that share ≥ 3
    distinct 3-gram shingles with an eval/benchmark document (benchmark =
    doc_id % 50 = 0 slice). The benchmark side broadcasts (suites are
    dimension-sized next to a corpus); corpus work is one linear shingle
    pass."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    return dedup.ngram_contamination(corpus, bench, min_shared=3)


# Per-source corpus report card: the curation summary (volume, token
# mass, quality, exact-dup rate) every corpus pipeline publishes. Means
# go through DECIMAL sums (order-independent) and round(6) in both
# engines; dup_ratio = 1 - distinct-content/docs.
@register(
    "corpus_source_report",
    oracle=rf"""
WITH m AS (
  SELECT doc_id, source,
    len(string_split(text, ' ')) AS n_words,
    {_QUALITY_EXPR} AS quality_score,
    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash
  FROM documents)
SELECT source,
  COUNT(*) AS n_docs,
  CAST(SUM(n_words) AS BIGINT) AS total_words,
  round(CAST(SUM(CAST(quality_score AS DECIMAL(28,10))) AS DOUBLE)
        / COUNT(*), 6) AS avg_quality,
  COUNT(DISTINCT content_hash) AS n_unique_contents,
  round(1.0 - CAST(COUNT(DISTINCT content_hash) AS DOUBLE) / COUNT(*), 6)
    AS dup_ratio
FROM m GROUP BY source
""",
    tags=("llm", "text", "quality", "profile"),
)
def corpus_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus report card: document count, token mass, mean
    quality (decimal-summed → order-independent), distinct-content count
    and exact-dup ratio — the summary table a curation pipeline publishes
    per crawl source. One scan + one groupBy; COUNT(DISTINCT md5) is the
    only extra aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    m = text.text_metrics(docs).select("doc_id", "n_words", "quality_score")
    fp = docs.select(
        "doc_id",
        "source",
        F.md5(text.normalize_text(F.col("text")).cast("binary")).alias(
            "content_hash"
        ),
    )
    joined = fp.join(m, "doc_id")
    n_docs = F.count(F.lit(1))
    n_unique = F.countDistinct("content_hash")
    return joined.groupBy("source").agg(
        n_docs.alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.round(
            F.sum(F.col("quality_score").cast("decimal(28,10)")).cast("double")
            / n_docs,
            6,
        ).alias("avg_quality"),
        n_unique.alias("n_unique_contents"),
        F.round(1.0 - n_unique.cast("double") / n_docs, 6).alias("dup_ratio"),
    )


# The end deliverable of corpus dedup: one keep/drop decision per document.
# Exact dups drop to their content-hash canonical first; the surviving
# canonicals then run near-dup clustering, and each cluster keeps only its
# minimum member. The oracle replays both stages (shingles restricted to
# exact-dedup survivors) plus the recursive closure.
# CTE block shared by dedup_keep_list and training_manifest (the latter
# composes the keep decision with quality + split).
_KEEP_LIST_CTES = rf"""
WITH RECURSIVE
norm AS (
  SELECT doc_id,
    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
  FROM documents),
canon AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY h) AS exact_canon FROM norm),
survivors AS (SELECT doc_id FROM canon WHERE doc_id = exact_canon),
wordarrs AS (
  SELECT d.doc_id, string_split(d.text, ' ') AS ws
  FROM documents d JOIN survivors s ON d.doc_id = s.doc_id),
shingles AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM wordarrs, range(1, 1024) g(i) WHERE i <= len(ws) - 2),
capped AS (
  SELECT doc_id, shingle FROM shingles
  QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= {dedup.DEFAULT_MAX_SHINGLE_DF}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach AS (
  SELECT s AS node, s AS lbl FROM edges
  UNION
  SELECT e.s, r.lbl FROM edges e JOIN reach r ON e.d = r.node),
clusters AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node)"""

_KEEP_LIST_SQL = _KEEP_LIST_CTES + """
SELECT c.doc_id AS doc_id,
  CASE WHEN c.doc_id <> c.exact_canon THEN 'exact_dup'
       WHEN cl.cluster_id IS NOT NULL AND cl.cluster_id <> c.doc_id
         THEN 'near_dup'
       ELSE 'kept' END AS reason,
  CASE WHEN c.doc_id <> c.exact_canon THEN c.exact_canon
       ELSE COALESCE(cl.cluster_id, c.doc_id) END AS canonical_doc_id
FROM canon c LEFT JOIN clusters cl ON c.doc_id = cl.doc_id
"""


@register(
    "dedup_keep_list",
    oracle=_KEEP_LIST_SQL,
    tags=("llm", "dedup", "pipeline"),
)
def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end deliverable of corpus dedup: per-document keep/drop with a
    reason ('kept' / 'exact_dup' / 'near_dup') and the canonical document
    it defers to. Stage 1 drops exact duplicates to their content-hash
    canonical; stage 2 clusters the SURVIVORS by shingle Jaccard
    (pointer-jumping components) and keeps each cluster's minimum member.
    Training corpus = rows with reason = 'kept'. Exact canonicals come
    from groupBy('h').agg(min) + join-back, not a window over the digest
    partition: the aggregation partial-combines map-side, so a
    mega-duplicated page (10⁶ identical copies, one digest) reduces to one
    row per input partition instead of materializing the whole group in a
    single window partition — same skew contract as
    :func:`dedup_keep_list_longest`."""
    docs = load_table(spark, sf_dir, "documents")
    # fan_out the SHARED docs input once (r13): the digest projection is
    # regex-dense per row and ran as the groupBy exchange's ONE map task
    # on a single-split fixture scan (2.5 s serial in the stage metrics);
    # survivors inherits the fanned partitioning through the broadcast
    # semi-join, so the downstream shingle pipeline (whose own fan_out
    # correctly refuses plans that already contain an Exchange) is
    # parallel too. Same rows everywhere — every consumer is
    # partitioning-independent.
    docs = fan_out(docs)
    norm = docs.select(
        "doc_id",
        F.md5(text.normalize_text(F.col("text")).cast("binary")).alias("h"),
    )
    exact_canon = norm.groupBy("h").agg(
        F.min("doc_id").alias("exact_canon")
    )
    canon = norm.join(exact_canon, "h")
    survivors = docs.join(
        canon.filter(F.col("doc_id") == F.col("exact_canon")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    clusters = dedup.duplicate_clusters(
        dedup.ngram_jaccard_pairs(survivors, 0.5)
    )
    return canon.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("doc_id") != F.col("exact_canon"), F.lit("exact_dup"))
        .when(
            F.col("cluster_id").isNotNull()
            & (F.col("cluster_id") != F.col("doc_id")),
            F.lit("near_dup"),
        )
        .otherwise(F.lit("kept"))
        .alias("reason"),
        F.when(F.col("doc_id") != F.col("exact_canon"), F.col("exact_canon"))
        .otherwise(F.coalesce("cluster_id", "doc_id"))
        .alias("canonical_doc_id"),
    )


@register(
    "ann_filtered_topk",
    oracle=f"""
WITH scored AS (
  SELECT b.vec_id AS query_id, a.vec_id AS vec_id, {COSINE_SQL} AS cosine_sim
  FROM embeddings a JOIN embeddings b ON a.label = b.label
  WHERE b.vec_id % 100 = 0 AND a.vec_id <> b.vec_id)
SELECT query_id, rank, vec_id, cosine_sim FROM (
  SELECT query_id, vec_id, cosine_sim,
    row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id)
      AS rank
  FROM scored) t
WHERE rank <= 10
""",
    tags=("llm", "similarity"),
    extra=True,
)
def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered similarity search: top-10 within the query's own
    label — exact results through an equi-join on the filter column (a
    pruned scan when the corpus is partitioned by it), not post-filtering
    an ANN candidate list (which starves k under selective filters)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        "label",
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return similarity.filtered_topk(emb, queries, filter_col="label", k=10)


@register(
    "knn_label_agreement",
    oracle=f"""
WITH scored AS (
  SELECT a.vec_id AS vec_id, a.label AS label, b.label AS nbr_label,
    {COSINE_SQL} AS cosine_sim, b.vec_id AS nbr_id
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
knn AS (
  SELECT * FROM (
    SELECT vec_id, label, nbr_label,
      row_number() OVER (PARTITION BY vec_id
                         ORDER BY cosine_sim DESC, nbr_id) AS rnk
    FROM scored) t
  WHERE rnk <= 5),
votes AS (
  SELECT vec_id, label, nbr_label, COUNT(*) AS v
  FROM knn GROUP BY 1, 2, 3),
majority AS (
  SELECT vec_id, label, nbr_label AS majority_label FROM (
    SELECT vec_id, label, nbr_label,
      row_number() OVER (PARTITION BY vec_id ORDER BY v DESC, nbr_label) AS vr
    FROM votes) t
  WHERE vr = 1),
agree AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN nbr_label = label THEN 1 ELSE 0 END) AS BIGINT)
      AS n_agree,
    COUNT(*) AS n
  FROM knn GROUP BY 1)
SELECT m.vec_id AS vec_id, m.label AS label, m.majority_label,
  a.n_agree, round(CAST(a.n_agree AS DOUBLE) / a.n, 6) AS agree_ratio
FROM majority m JOIN agree a ON m.vec_id = a.vec_id
""",
    tags=("llm", "similarity", "quality"),
    extra=True,
)
def knn_label_agreement_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Noisy-label detection: each vector's 5 nearest neighbors vote on
    its label; low agreement flags mislabeling candidates. All-pairs
    exact baseline — the identical vote stage
    (similarity.label_votes_from_candidates) consumes LSH candidates in
    knn_label_agreement_lsh."""
    return similarity.knn_label_agreement(
        load_table(spark, sf_dir, "embeddings"), k=5
    )


@register(
    "knn_label_agreement_lsh",
    oracle=f"""
WITH {_LSH_BUCKETS_SQL},
und AS (
  SELECT DISTINCT x.vec_id AS u, y.vec_id AS v
  FROM ebuckets x JOIN ebuckets y USING (tbl, bucket)
  WHERE x.vec_id < y.vec_id),
cand AS (
  SELECT u AS vec_id, v AS nbr_id FROM und
  UNION ALL
  SELECT v AS vec_id, u AS nbr_id FROM und),
scored AS (
  SELECT c.vec_id AS vec_id, a.label AS label, b.label AS nbr_label,
    {COSINE_SQL} AS cosine_sim, c.nbr_id AS nbr_id
  FROM cand c
  JOIN embeddings a ON c.vec_id = a.vec_id
  JOIN embeddings b ON c.nbr_id = b.vec_id),
knn AS (
  SELECT * FROM (
    SELECT vec_id, label, nbr_label,
      row_number() OVER (PARTITION BY vec_id
                         ORDER BY cosine_sim DESC, nbr_id) AS rnk
    FROM scored) t
  WHERE rnk <= 5),
votes AS (
  SELECT vec_id, label, nbr_label, COUNT(*) AS v
  FROM knn GROUP BY 1, 2, 3),
majority AS (
  SELECT vec_id, label, nbr_label AS majority_label FROM (
    SELECT vec_id, label, nbr_label,
      row_number() OVER (PARTITION BY vec_id ORDER BY v DESC, nbr_label) AS vr
    FROM votes) t
  WHERE vr = 1),
agree AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN nbr_label = label THEN 1 ELSE 0 END) AS BIGINT)
      AS n_agree,
    COUNT(*) AS n
  FROM knn GROUP BY 1)
SELECT m.vec_id AS vec_id, m.label AS label, m.majority_label,
  a.n_agree, round(CAST(a.n_agree AS DOUBLE) / a.n, 6) AS agree_ratio
FROM majority m JOIN agree a ON m.vec_id = a.vec_id
""",
    tags=("llm", "similarity", "quality"),
    extra=True,
)
def knn_label_agreement_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path noisy-label detection (r4 verdict item 2): the SAME vote
    stage as knn_label_agreement, fed from LSH bucket-mate candidates —
    cost O(corpus + Σ occupancy²), no all-pairs term. Deterministic
    pipeline → the oracle replays candidates AND the vote tail,
    approximation included."""
    return similarity.knn_label_agreement_lsh(
        load_table(spark, sf_dir, "embeddings"), k=5,
        n_tables=8, bits_per_table=3,
    )


# Centroid = per-label decimal SUM vector (cosine is scale-invariant, so
# dividing by the count is unnecessary — and skipping it removes the one
# step where engine decimal-division rules could drift).
@register(
    "label_centroid_outliers",
    oracle="""
WITH ed AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
dims AS (
  SELECT label, i AS pos, e[i] AS v
  FROM ed, range(1, 4096) g(i) WHERE i <= len(e)),
sums AS (
  SELECT label, pos, CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) AS s
  FROM dims GROUP BY 1, 2),
cent AS (SELECT label, list(s ORDER BY pos) AS c FROM sums GROUP BY label)
SELECT vec_id, label,
  round(list_dot_product(e, c)
        / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(c, c))), 6)
    AS centroid_cosine
FROM ed JOIN cent USING (label)
""",
    tags=("llm", "similarity", "quality"),
    extra=True,
)
def label_centroid_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding outlier scores: cosine to the label centroid
    (decimal-sum vector — exact in both engines). The low tail flags
    corrupt/mislabeled/off-distribution samples."""
    return similarity.label_centroid_outliers(
        load_table(spark, sf_dir, "embeddings")
    )


@register(
    "token_entropy",
    oracle="""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS c FROM terms GROUP BY 1, 2),
agg AS (
  SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_distinct,
    CAST(SUM(CAST(c * ln(c) AS DECIMAL(28,12))) AS DOUBLE) AS clnc
  FROM tf GROUP BY 1)
SELECT doc_id,
  round(ln(CAST(n AS DOUBLE)) - clnc / CAST(n AS DOUBLE), 6) AS entropy,
  CASE WHEN n_distinct >= 2
       THEN round((ln(CAST(n AS DOUBLE)) - clnc / CAST(n AS DOUBLE))
                  / ln(CAST(n_distinct AS DOUBLE)), 6) END AS norm_entropy
FROM agg
""",
    tags=("llm", "text", "quality"),
    extra=True,
)
def token_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-distribution Shannon entropy per document (+ normalized form)
    — low entropy at a given length flags keyword stuffing and templated
    spam."""
    return text.token_entropy(load_table(spark, sf_dir, "documents"))


@register(
    "unigram_logprob",
    oracle="""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS c FROM terms GROUP BY 1, 2),
corpus AS (SELECT term, CAST(SUM(c) AS BIGINT) AS cf FROM tf GROUP BY 1),
tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS n_total FROM corpus),
agg AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
    CAST(SUM(CAST(c * ln(cf) AS DECIMAL(28,12))) AS DOUBLE) AS s
  FROM tf JOIN corpus USING (term) GROUP BY 1)
SELECT doc_id, n_tokens,
  round(s / CAST(n_tokens AS DOUBLE)
        - ln(CAST((SELECT n_total FROM tot) AS DOUBLE)), 6) AS mean_logprob
FROM agg
""",
    tags=("llm", "text", "quality"),
    extra=True,
)
def unigram_logprob_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality proxy: mean per-token log-probability under
    the corpus's own unigram distribution — the perplexity-bucket filter
    with the corpus itself as the LM."""
    return text.unigram_logprob(load_table(spark, sf_dir, "documents"))


# Sub-document span dedup: fixed 16-word chunks, md5 digests, occurrence
# counting. The oracle replays the chunking with range(0,2048)+WHERE (the
# lateral-free form — fixture docs are <600 words; a corpus with longer
# documents raises the bound, it does not change the plan).
@register(
    "chunk_dedup_stats",
    oracle="""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
chunks AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(w, s + 1, s + 16), ' ')) AS chunk_hash
  FROM ws, range(0, 2048) g(s) WHERE s < len(w) AND s % 16 = 0),
occ AS (
  SELECT chunk_hash, COUNT(DISTINCT doc_id) AS n_docs
  FROM chunks GROUP BY 1)
SELECT doc_id,
  COUNT(*) AS n_chunks,
  CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_shared_chunks,
  round(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)
        / CAST(COUNT(*) AS DOUBLE), 6) AS shared_chunk_frac
FROM chunks JOIN occ USING (chunk_hash)
GROUP BY doc_id
""",
    tags=("llm", "dedup", "text"),
    extra=True,
)
def chunk_dedup_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplication profile: per document, the fraction of
    16-word chunks whose exact content recurs in other documents — the
    signal whole-document dedup misses (boilerplate welded onto unique
    pages). Linear chunk explode + one digest shuffle, no pairwise term."""
    return dedup.chunk_dedup_stats(
        load_table(spark, sf_dir, "documents"), chunk_words=16
    )


@register(
    "boilerplate_chunks",
    oracle="""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
chunks AS (
  SELECT doc_id, array_to_string(list_slice(w, s + 1, s + 16), ' ') AS chunk_text
  FROM ws, range(0, 2048) g(s) WHERE s < len(w) AND s % 16 = 0)
SELECT md5(chunk_text) AS chunk_hash,
       MIN(chunk_text) AS chunk_text,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_occurrences
FROM chunks
GROUP BY 1
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occurrences DESC, chunk_hash ASC
LIMIT 20
""",
    tags=("llm", "dedup", "text"),
    extra=True,
)
def boilerplate_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate list: top-20 exact 16-word chunks recurring
    across the most documents — the removal list for "drop any span
    occurring >= N times" curation. One digest aggregation +
    TakeOrderedAndProject (no global sort)."""
    return dedup.boilerplate_chunks(
        load_table(spark, sf_dir, "documents"), chunk_words=16, min_docs=2, k=20
    )


@register(
    "chunk_keep_list",
    oracle="""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
chunks AS (
  SELECT doc_id, s // 16 AS chunk_id,
         array_to_string(list_slice(w, s + 1, s + 16), ' ') AS chunk_text
  FROM ws, range(0, 2048) g(s) WHERE s < len(w) AND s % 16 = 0),
h AS (
  SELECT *, md5(chunk_text) AS chunk_hash,
         COUNT(*) OVER (PARTITION BY md5(chunk_text)) AS n_occurrences,
         ROW_NUMBER() OVER (PARTITION BY md5(chunk_text)
                            ORDER BY doc_id, chunk_id) AS rn
  FROM chunks)
SELECT doc_id, chunk_id, chunk_hash, n_occurrences, rn = 1 AS keep,
       chunk_text
FROM h
""",
    tags=("llm", "dedup", "text"),
    extra=True,
)
def chunk_keep_list_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring-dedup keep/drop list at 16-word-chunk granularity:
    the canonical first occurrence of every repeated span keeps, every
    other occurrence drops. Skew-immune min-struct aggregation (no window
    over the digest). The oracle replays it with a window — fine at oracle
    scale, wrong shape at corpus scale."""
    return dedup.chunk_keep_list(
        load_table(spark, sf_dir, "documents"), chunk_words=16
    )


@register(
    "span_deduped_corpus",
    oracle="""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
chunks AS (
  SELECT doc_id, s // 16 AS chunk_id,
         array_to_string(list_slice(w, s + 1, s + 16), ' ') AS chunk_text
  FROM ws, range(0, 2048) g(s) WHERE s < len(w) AND s % 16 = 0),
h AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(chunk_text)
                               ORDER BY doc_id, chunk_id) AS rn
  FROM chunks)
SELECT doc_id,
  COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk_text END, ' '
                      ORDER BY chunk_id), '') AS clean_text,
  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM h GROUP BY doc_id
""",
    tags=("llm", "dedup", "text"),
    extra=True,
)
def span_deduped_corpus_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-dedup end deliverable: per-document text rebuilt from only the
    kept chunks — every repeated 16-word span survives exactly once
    corpus-wide (its first occurrence). Empty clean_text flags documents
    that were nothing but repeats."""
    return dedup.span_deduped_corpus(
        load_table(spark, sf_dir, "documents"), chunk_words=16
    )


@register(
    "mixture_sample",
    oracle="""
WITH r AS (SELECT * FROM (VALUES ('src0', 2.25), ('src1', 1.5),
                                 ('src2', 1.0), ('src3', 0.5),
                                 ('src4', 0.25)) t(source, rate)),
d AS (SELECT doc_id, source, rate FROM documents JOIN r USING (source)),
e AS (SELECT doc_id, source, rate, CAST(s AS INT) AS epoch
      FROM d, range(0, 8) g(s) WHERE s <= CAST(FLOOR(rate) AS INT)),
u AS (SELECT *,
  CAST(('0x' || substr(md5(doc_id || ':' || epoch || ':42'), 1, 12))
       AS BIGINT) / 281474976710656.0 AS uu
  FROM e)
SELECT doc_id, source, epoch
FROM u WHERE epoch < CAST(FLOOR(rate) AS INT) OR uu < rate - FLOOR(rate)
""",
    tags=("llm", "sampling"),
    extra=True,
)
def mixture_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix construction: per-source epoch rates (2.25 epochs of
    src0, …, 0.25 of src4; other sources dropped). Replication by
    sequence+explode, fractional epochs by md5(id:epoch:seed) hash
    threshold — zero joins, zero shuffles, repartition-stable, oracle-
    replayable."""
    rates = {"src0": 2.25, "src1": 1.5, "src2": 1.0, "src3": 0.5,
             "src4": 0.25}
    docs = load_table(spark, sf_dir, "documents")
    return sampling.mixture_sample(docs, rates).select(
        "doc_id", "source", "epoch"
    )


@register(
    "vocab_oov_rate",
    oracle="""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
vocab AS (
  SELECT term FROM terms GROUP BY term
  ORDER BY COUNT(*) DESC, term ASC LIMIT 20),
scored AS (
  SELECT doc_id, t.term, v.term IS NOT NULL AS iv
  FROM terms t LEFT JOIN vocab v USING (term))
SELECT doc_id,
  COUNT(*) AS n_tokens,
  CAST(SUM(CASE WHEN iv THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
  round(SUM(CASE WHEN iv THEN 0 ELSE 1 END) / CAST(COUNT(*) AS DOUBLE), 6)
    AS oov_rate
FROM scored GROUP BY doc_id
""",
    tags=("llm", "text", "quality"),
    extra=True,
)
def vocab_oov_rate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-20 word
    list (the fixture vocabulary is 31 synthetic words, so 20 exercises a
    real in/out split; ties broken by term for a deterministic boundary).
    One corpus TF shuffle + a broadcast membership join."""
    return text.vocab_oov_rate(
        load_table(spark, sf_dir, "documents"), vocab_size=20
    )


@register(
    "span_dedup_incremental",
    oracle="""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
chunks AS (
  SELECT doc_id, s // 16 AS chunk_id,
         md5(array_to_string(list_slice(w, s + 1, s + 16), ' ')) AS chunk_hash
  FROM ws, range(0, 2048) g(s) WHERE s < len(w) AND s % 16 = 0),
base AS (SELECT DISTINCT chunk_hash FROM chunks WHERE doc_id % 10 != 0),
delta AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY chunk_hash
                               ORDER BY doc_id, chunk_id) AS rn
  FROM chunks WHERE doc_id % 10 = 0)
SELECT d.doc_id, d.chunk_id, d.chunk_hash,
       b.chunk_hash IS NOT NULL AS in_base,
       (b.chunk_hash IS NULL AND rn = 1) AS keep
FROM delta d LEFT JOIN base b USING (chunk_hash)
""",
    tags=("llm", "dedup", "incremental"),
)
def span_dedup_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span dedup of a delta batch (doc_id % 10 = 0) against the base
    corpus's precomputed chunk-digest index — the base is never re-chunked
    (the probe reads only the index table; first-seen-wins canonical
    semantics, see chunk_keep_list_vs_index)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    index = dedup.build_chunk_index(base, chunk_words=16)
    return dedup.chunk_keep_list_vs_index(delta, index, chunk_words=16)


# Keep-longest variant of the dedup keep list: curation pipelines usually
# keep the RICHEST copy of duplicated content (longest text), not the
# lowest id — boilerplate-stripped rescrapes and truncated mirrors should
# lose to the full page. Canonical per exact group / near-dup cluster =
# max n_chars, tie-broken by min doc_id (min-struct aggregation, skew-
# immune; the oracle replays it with ordered windows).
_KEEP_LIST_LONGEST_SQL = rf"""
WITH RECURSIVE
norm AS (
  SELECT doc_id, n_chars,
    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
  FROM documents),
canon AS (
  SELECT doc_id,
    FIRST_VALUE(doc_id) OVER (PARTITION BY h ORDER BY n_chars DESC, doc_id)
      AS exact_canon
  FROM norm),
survivors AS (SELECT doc_id FROM canon WHERE doc_id = exact_canon),
wordarrs AS (
  SELECT d.doc_id, string_split(d.text, ' ') AS ws
  FROM documents d JOIN survivors s ON d.doc_id = s.doc_id),
shingles AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM wordarrs, range(1, 1024) g(i) WHERE i <= len(ws) - 2),
capped AS (
  SELECT doc_id, shingle FROM shingles
  QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= {dedup.DEFAULT_MAX_SHINGLE_DF}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach AS (
  SELECT s AS node, s AS lbl FROM edges
  UNION
  SELECT e.s, r.lbl FROM edges e JOIN reach r ON e.d = r.node),
clusters AS (
  SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
ranked AS (
  SELECT cl.cluster_id, cl.doc_id,
    ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
                       ORDER BY n.n_chars DESC, cl.doc_id) AS rn
  FROM clusters cl JOIN norm n ON cl.doc_id = n.doc_id),
bestc AS (SELECT cluster_id, doc_id AS best_doc FROM ranked WHERE rn = 1)
SELECT c.doc_id AS doc_id,
  CASE WHEN c.doc_id <> c.exact_canon THEN 'exact_dup'
       WHEN bc.best_doc IS NOT NULL AND bc.best_doc <> c.doc_id
         THEN 'near_dup'
       ELSE 'kept' END AS reason,
  CASE WHEN c.doc_id <> c.exact_canon THEN c.exact_canon
       ELSE COALESCE(bc.best_doc, c.doc_id) END AS canonical_doc_id
FROM canon c
LEFT JOIN clusters cl ON c.doc_id = cl.doc_id
LEFT JOIN bestc bc ON cl.cluster_id = bc.cluster_id
"""


@register(
    "dedup_keep_list_longest",
    oracle=_KEEP_LIST_LONGEST_SQL,
    tags=("llm", "dedup", "pipeline"),
    extra=True,
)
def dedup_keep_list_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_keep_list with keep-longest canonicals: each exact group and
    near-dup cluster keeps its longest member (tie: min doc_id) instead of
    its minimum id — truncated mirrors lose to the full page. Canonicals
    via min(struct(-n_chars, doc_id)) AGGREGATIONS + join-back, not a
    window over the digest partition: groupBy partial-aggregates map-side,
    so a mega-duplicated page (10⁶ identical copies, one digest) reduces
    to one row per input partition instead of materializing the whole
    group in a single window partition — the same skew contract as
    chunk_keep_list."""
    docs = load_table(spark, sf_dir, "documents")
    # fan_out the shared docs input once — see dedup_keep_list.
    docs = fan_out(docs)
    norm = docs.select(
        "doc_id",
        "n_chars",
        F.md5(text.normalize_text(F.col("text")).cast("binary")).alias("h"),
    )
    pick = F.struct(
        (-F.col("n_chars")).alias("nn"), F.col("doc_id").alias("d")
    )
    exact_canon = norm.groupBy("h").agg(
        F.min(pick).getField("d").alias("exact_canon")
    )
    canon = norm.join(exact_canon, "h")
    survivors = docs.join(
        canon.filter(F.col("doc_id") == F.col("exact_canon")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    clusters = dedup.duplicate_clusters(
        dedup.ngram_jaccard_pairs(survivors, 0.5)
    )
    best = (
        clusters.join(norm.select("doc_id", "n_chars"), "doc_id")
        .groupBy("cluster_id")
        .agg(F.min(pick).getField("d").alias("best_doc"))
    )
    return (
        canon.join(clusters, "doc_id", "left")
        .join(best, "cluster_id", "left")
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") != F.col("exact_canon"), F.lit("exact_dup")
            )
            .when(
                F.col("best_doc").isNotNull()
                & (F.col("best_doc") != F.col("doc_id")),
                F.lit("near_dup"),
            )
            .otherwise(F.lit("kept"))
            .alias("reason"),
            F.when(
                F.col("doc_id") != F.col("exact_canon"), F.col("exact_canon")
            )
            .otherwise(F.coalesce("best_doc", "doc_id"))
            .alias("canonical_doc_id"),
        )
    )


# The end-to-end curation deliverable: dedup keep decision × quality
# threshold × reproducible split — one row per document that survives into
# the training mix, with the split it trains in.
_MANIFEST_SQL = _KEEP_LIST_CTES + f""",
kept AS (
  SELECT c.doc_id FROM canon c
  LEFT JOIN clusters cl ON c.doc_id = cl.doc_id
  WHERE c.doc_id = c.exact_canon
    AND (cl.cluster_id IS NULL OR cl.cluster_id = c.doc_id)),
m AS (SELECT doc_id, {{quality_expr}} AS quality_score FROM documents),
b AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      AS bucket
  FROM documents)
SELECT d.doc_id, d.lang, d.source, m.quality_score,
  CASE WHEN b.bucket < {_TRAIN_HI} THEN 'train'
       WHEN b.bucket < {_VAL_HI} THEN 'val'
       ELSE 'test' END AS split
FROM documents d
JOIN kept k ON d.doc_id = k.doc_id
JOIN m ON d.doc_id = m.doc_id
JOIN b ON d.doc_id = b.doc_id
WHERE m.quality_score >= 0.53
"""


@register(
    "training_manifest",
    oracle=_MANIFEST_SQL.format(quality_expr=_QUALITY_EXPR),
    tags=("llm", "pipeline", "dedup", "quality", "sampling"),
    extra=True,
)
def training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline's end deliverable in one plan: documents that
    (1) survive two-stage dedup (exact groups + near-dup clusters, keep
    minimum member), (2) clear the quality threshold (0.53 — the fixture
    median), and (3) carry their reproducible hash-bucket train/val/test
    split. One row per surviving document: (doc_id, lang, source,
    quality_score, split). Every stage is an already-verified operator —
    this query pins that they COMPOSE: semi-join against the keep list,
    broadcast-friendly metric joins, no new shuffle beyond the stages'
    own."""
    docs = load_table(spark, sf_dir, "documents")
    kept = dedup_keep_list(spark, sf_dir).filter(
        F.col("reason") == "kept"
    ).select("doc_id")
    metrics = text.text_metrics(docs).select("doc_id", "quality_score")
    split = sampling.hash_split(docs).select("doc_id", "split")
    return (
        docs.select("doc_id", "lang", "source")
        .join(kept, "doc_id", "left_semi")
        .join(metrics, "doc_id")
        .join(split, "doc_id")
        .filter(F.col("quality_score") >= 0.53)
        .select("doc_id", "lang", "source", "quality_score", "split")
    )


@register(
    "embedding_quantize_int8",
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
m AS (
  SELECT vec_id, x,
    list_aggregate(list_transform(x, v -> abs(v)), 'max') AS amax
  FROM e)
SELECT vec_id,
  array_to_string(
    CASE WHEN amax = 0 THEN list_transform(x, v -> CAST(0 AS TINYINT))
         ELSE list_transform(x, v -> CAST(round(v / (amax / 127.0)) AS TINYINT))
    END, ',') AS codes_csv,
  round(amax / 127.0, 9) AS scale
FROM m
""",
    tags=("llm", "similarity", "storage"),
    extra=True,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding corpus
    (codes + per-vector scale) — 4× smaller than float32, the storage form
    a 100 TB vector index actually ships. Identical arithmetic in both
    engines (x / (amax/127), HALF-away rounding) so the codes hash-match
    exactly; the int8 codes are projected as a CSV string because the
    driver's schema compare is kind-strict and has no array kind."""
    q = similarity.quantize_int8(load_table(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        F.array_join(F.col("codes"), ",").alias("codes_csv"),
        "scale",
    )


@register(
    "ann_quantized_topk",
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
m AS (
  SELECT vec_id, x,
    list_aggregate(list_transform(x, v -> abs(v)), 'max') AS amax
  FROM e),
qz AS (
  SELECT vec_id,
    CASE WHEN amax = 0 THEN list_transform(x, v -> CAST(0 AS TINYINT))
         ELSE list_transform(x, v -> CAST(round(v / (amax / 127.0)) AS TINYINT))
    END AS codes,
    round(amax / 127.0, 9) AS scale
  FROM m),
deq AS (SELECT vec_id, list_transform(codes, q -> q * scale) AS emb FROM qz),
scored AS (
  SELECT b.vec_id AS query_id, a.vec_id AS vec_id,
    list_dot_product(CAST(b.embedding AS DOUBLE[]), a.emb)
    / (sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])))
       * sqrt(list_dot_product(a.emb, a.emb))) AS cosine_sim
  FROM deq a, embeddings b
  WHERE b.vec_id % 100 = 0 AND a.vec_id <> b.vec_id)
SELECT query_id, rank, vec_id, cosine_sim FROM (
  SELECT query_id, vec_id, cosine_sim,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine_sim DESC, vec_id) AS rank
  FROM scored) t
WHERE rank <= 10
""",
    tags=("llm", "similarity", "storage"),
)
def ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search over the int8-quantized corpus: float queries against
    dequantized codes — proof the 4×-smaller storage form is usable
    end-to-end, with the oracle replaying quantize→dequantize→cosine→rank
    bit-for-bit. Recall vs the float corpus is pinned in
    tests/test_similarity.py. THE DOCUMENTED ANN DEFAULT (r10): the r9
    sf1.0 sweep measured recall 0.99 at 2x brute-force speed, beating
    every index path at 20k vectors — see operators/similarity.py module
    docstring for the brute-vs-IVF crossover rule."""
    emb = load_table(spark, sf_dir, "embeddings")
    deq = similarity.dequantize(similarity.quantize_int8(emb))
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return similarity.brute_force_topk(deq, queries, k=10)


@register(
    "cross_source_dup_matrix",
    oracle=f"""
WITH {SHINGLES_SQL},
capped AS (
  SELECT doc_id, shingle FROM shingles
  QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= {dedup.DEFAULT_MAX_SHINGLE_DF}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
nd AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5),
src AS (SELECT doc_id, source FROM documents)
SELECT LEAST(x.source, y.source) AS source_a,
       GREATEST(x.source, y.source) AS source_b,
       COUNT(*) AS n_dup_pairs
FROM nd JOIN src x ON nd.doc_a = x.doc_id
        JOIN src y ON nd.doc_b = y.doc_id
GROUP BY 1, 2
""",
    tags=("llm", "dedup", "profile"),
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources mirror which: NEAR-duplicate pairs (3-gram Jaccard
    >= 0.5, the corpus's dup definition — the fixture has no byte-exact
    dups) counted per unordered source pair; the diagonal is within-source
    duplication. Pair generation is the df-capped shingle join, never
    all-pairs. The curation view that finds crawls copying each other."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, 0.5).select("doc_a", "doc_b")
    src = docs.select("doc_id", "source")
    j = (
        pairs.join(src.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("source", "_sa"), "doc_a")
        .join(src.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("source", "_sb"), "doc_b")
        .select(
            F.least(F.col("_sa"), F.col("_sb")).alias("source_a"),
            F.greatest(F.col("_sa"), F.col("_sb")).alias("source_b"),
        )
    )
    return j.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_dup_pairs")
    )


@register(
    "embedding_near_dup_incremental",
    oracle="""
WITH base AS (SELECT * FROM embeddings WHERE vec_id % 10 != 0),
delta AS (SELECT * FROM embeddings WHERE vec_id % 10 = 0),
alist AS (
  SELECT list(CAST(embedding AS DOUBLE[]) ORDER BY vec_id) AS anchors
  FROM (SELECT vec_id, embedding FROM base ORDER BY vec_id LIMIT 24)),
bbits AS (
  SELECT e.vec_id,
    list_transform(al.anchors,
      x -> CASE WHEN list_dot_product(x, CAST(e.embedding AS DOUBLE[])) > 0
           THEN 1 ELSE 0 END) AS bits
  FROM base e, alist al),
bbuckets AS (
  SELECT vec_id, t.t AS tbl,
    bits[t.t*3+1]*4 + bits[t.t*3+2]*2 + bits[t.t*3+3] AS bucket
  FROM bbits, range(0, 8) t(t)),
dbits AS (
  SELECT e.vec_id,
    list_transform(al.anchors,
      x -> CASE WHEN list_dot_product(x, CAST(e.embedding AS DOUBLE[])) > 0
           THEN 1 ELSE 0 END) AS bits
  FROM delta e, alist al),
dbuckets AS (
  SELECT vec_id, t.t AS tbl,
    bits[t.t*3+1]*4 + bits[t.t*3+2]*2 + bits[t.t*3+3] AS bucket
  FROM dbits, range(0, 8) t(t)),
cand AS (
  SELECT DISTINCT d.vec_id AS vec_new, b.vec_id AS vec_base
  FROM dbuckets d JOIN bbuckets b USING (tbl, bucket)),
scored AS (
  SELECT vec_new, vec_base,
    list_dot_product(CAST(n.embedding AS DOUBLE[]),
                     CAST(b.embedding AS DOUBLE[]))
    / (sqrt(list_dot_product(CAST(n.embedding AS DOUBLE[]),
                             CAST(n.embedding AS DOUBLE[])))
     * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])))) AS cosine_sim
  FROM cand JOIN delta n ON vec_new = n.vec_id
            JOIN base b ON vec_base = b.vec_id)
SELECT vec_new, vec_base, cosine_sim FROM scored WHERE cosine_sim >= 0.45
""",
    tags=("llm", "dedup", "similarity", "incremental"),
)
def embedding_near_dup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup of a delta batch (vec_id % 10 = 0) against the
    base corpus: delta×base bucket join — the base×base term never exists,
    mirroring the MinHash incremental contract. Anchors from the base (at
    scale: part of a persisted index probed per batch). Deterministic →
    the oracle replays buckets + verification."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_near_dup_pairs_incremental(
        emb.filter(F.col("vec_id") % 10 != 0),
        emb.filter(F.col("vec_id") % 10 == 0),
        0.45,
        n_tables=8,
        bits_per_table=3,
    )


@register(
    "semantic_keep_list",
    oracle=f"""
WITH RECURSIVE {_LSH_PAIRS_CORE},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM lshpairs
  UNION SELECT doc_b, doc_a FROM lshpairs),
reach AS (
  SELECT s AS node, s AS lbl FROM edges
  UNION
  SELECT e.s, r.lbl FROM edges e JOIN reach r ON e.d = r.node),
clusters AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node)
SELECT e.vec_id,
  CASE WHEN c.cluster_id IS NOT NULL AND c.cluster_id <> e.vec_id
       THEN 'semantic_dup' ELSE 'kept' END AS reason,
  COALESCE(c.cluster_id, e.vec_id) AS canonical_vec_id
FROM embeddings e LEFT JOIN clusters c ON e.vec_id = c.node
""",
    tags=("llm", "dedup", "similarity", "pipeline"),
)
def semantic_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding-space keep list: every vector keeps unless it sits in
    an LSH-verified near-dup cluster with a lower-id canonical — the
    semantic twin of ``dedup_keep_list``'s text pipeline, one decision row
    per corpus vector (training set = reason 'kept'). Same corpus-linear
    stages as ``embedding_dup_clusters`` plus one left join back to the
    full corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.lsh_near_dup_pairs(
        emb, 0.45, n_tables=8, bits_per_table=3
    ).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    clusters = dedup.duplicate_clusters(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )
    return emb.select("vec_id").join(clusters, "vec_id", "left").select(
        "vec_id",
        F.when(
            F.col("cluster_id").isNotNull()
            & (F.col("cluster_id") != F.col("vec_id")),
            F.lit("semantic_dup"),
        )
        .otherwise(F.lit("kept"))
        .alias("reason"),
        F.coalesce("cluster_id", "vec_id").alias("canonical_vec_id"),
    )


# Fixture documents carry no URL; a deterministic one is synthesized from
# (source, doc_id) with rotating subdomains so host extraction, the
# registrable-domain collapse (www/cdn/apex → one domain), and the
# per-domain cap are all exercised and SQL-replayable.
_URL_SQL = """
docs_url AS (
  SELECT doc_id, source, n_chars,
    'https://' ||
    CASE WHEN doc_id % 3 = 0 THEN 'www.'
         WHEN doc_id % 3 = 1 THEN 'cdn.' ELSE '' END ||
    source || '.org/doc/' || doc_id AS url
  FROM documents),
hosted AS (
  SELECT doc_id, source, n_chars,
    regexp_extract(url, '^https?://([^/]+)', 1) AS host,
    nullif(regexp_extract(regexp_extract(url, '^https?://([^/]+)', 1),
                          '([^.]+\\.[^.]+)$', 1), '') AS domain
  FROM docs_url)
"""


def _docs_with_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sub = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("www."))
        .when(F.col("doc_id") % 3 == 1, F.lit("cdn."))
        .otherwise(F.lit(""))
    )
    return docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.concat(
            F.lit("https://"), sub, F.col("source"), F.lit(".org/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )


@register(
    "domain_caps",
    oracle=f"""
WITH {_URL_SQL},
ranked AS (
  SELECT domain, doc_id,
    row_number() OVER (
      PARTITION BY domain
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cap_rank
  FROM hosted)
SELECT domain, doc_id, cap_rank FROM ranked WHERE cap_rank <= 20
""",
    tags=("llm", "curation", "web"),
)
def domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (C4/RefinedWeb-style): parse_url host
    extraction → registrable-domain collapse (www./cdn./apex subdomains
    fold into one domain) → keep the 20 hash-rank-first documents per
    domain. The rank window rides WindowGroupLimit (map-side k-per-
    stratum shedding), so a mega-domain never funnels one reducer."""
    return web.domain_cap(
        web.with_url_host(_docs_with_urls(spark, sf_dir)), 20
    )


@register(
    "domain_profile",
    oracle=f"""
WITH {_URL_SQL}
SELECT domain, COUNT(*) AS n_docs,
  COUNT(DISTINCT host) AS n_hosts,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM hosted GROUP BY domain
""",
    tags=("llm", "curation", "web"),
    extra=True,
)
def domain_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus triage: doc count, distinct hosts, total chars —
    the view that decides caps and blocklists. One aggregation on the
    domain key."""
    return web.domain_stats(
        web.with_url_host(_docs_with_urls(spark, sf_dir))
    )


@register(
    "domain_blocklist",
    oracle=f"""
WITH {_URL_SQL}
SELECT doc_id, domain FROM hosted
WHERE domain NOT IN ('src0.org', 'src7.org', 'src13.org')
""",
    tags=("llm", "curation", "web"),
    extra=True,
)
def domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist filtering: the corpus minus documents whose
    registrable domain is on a (broadcast, list-sized) blocklist — the
    other half of the C4-style domain step next to the cap. Extra
    registry: locally oracle-verified."""
    blocked = spark.createDataFrame(
        [("src0.org",), ("src7.org",), ("src13.org",)], "domain string"
    )
    return web.domain_blocklist_filter(
        web.with_url_host(_docs_with_urls(spark, sf_dir)), blocked
    ).select("doc_id", "domain")


@register(
    "url_normalize",
    oracle=r"""
WITH raw AS (
  SELECT doc_id,
    CASE doc_id % 5
      WHEN 0 THEN 'HTTP://' || source || '.org:80/a/b/?utm_source=x&b=2&a=1#frag'
      WHEN 1 THEN 'https://' || source || '.org:443/a'
      WHEN 2 THEN 'https://cdn.' || source || '.org:8443/x/?gclid=1'
      WHEN 3 THEN 'not a url'
      ELSE 'http://' || source || '.org/path//'
    END AS url
  FROM documents),
parts AS (
  SELECT doc_id, url,
    regexp_replace(url, '#.*$', '') AS u
  FROM raw),
fields AS (
  SELECT doc_id, url,
    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
    lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)', 1)) AS hostport,
    regexp_replace(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+([^?#]*)', 1),
                   '/+$', '') AS path,
    regexp_extract(u, '\?([^#]*)', 1) AS query
  FROM parts),
built AS (
  SELECT doc_id, url, scheme,
    regexp_replace(hostport, ':[0-9]+$', '') AS hostname,
    regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
    path,
    array_to_string(list_sort(list_filter(string_split(query, '&'),
      p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|gclid|fbclid)='))),
      '&') AS kept
  FROM fields)
SELECT doc_id, url,
  CASE WHEN scheme <> '' AND hostname <> '' THEN
    scheme || '://' || hostname ||
    CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
           OR (scheme = 'https' AND port = '443')
         THEN '' ELSE ':' || port END ||
    path ||
    CASE WHEN kept <> '' THEN '?' || kept ELSE '' END
  END AS url_norm
FROM built
""",
    tags=("llm", "curation", "web"),
    extra=True,
)
def url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization before URL-level dedup: lowercase scheme and
    host, strip fragments/default ports/trailing slashes/tracking params
    (utm_*, gclid, fbclid), sort surviving query params; junk or relative
    inputs yield NULL."""
    docs = load_table(spark, sf_dir, "documents")
    messy = docs.select(
        "doc_id",
        F.element_at(
            F.array(
                F.concat(
                    F.lit("HTTP://"), F.col("source"),
                    F.lit(".org:80/a/b/?utm_source=x&b=2&a=1#frag"),
                ),
                F.concat(
                    F.lit("https://"), F.col("source"), F.lit(".org:443/a")
                ),
                F.concat(
                    F.lit("https://cdn."), F.col("source"),
                    F.lit(".org:8443/x/?gclid=1"),
                ),
                F.lit("not a url"),
                F.concat(
                    F.lit("http://"), F.col("source"), F.lit(".org/path//")
                ),
            ),
            (F.col("doc_id") % 5 + 1).cast("int"),
        ).alias("url"),
    )
    return web.normalize_url(messy)


@register(
    "quality_model_score",
    oracle=rf"""
WITH m AS (
  SELECT doc_id,
    length(text) AS n_chars,
    len(string_split(text, ' ')) AS n_words,
    len(list_filter(string_split(text, ' '),
        w -> list_contains([{_EN_STOPWORDS}], w))) AS sh,
    length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
  FROM documents),
f AS (
  SELECT doc_id, n_words,
    round(CAST(sh AS DOUBLE) / n_words, 6) AS stop_r,
    round(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_r,
    round(CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words, 6) AS awl
  FROM m),
z AS (
  SELECT doc_id,
    -2.0 + 6.0 * stop_r - 4.0 * punct_r
    + CASE WHEN awl BETWEEN 3 AND 10 THEN 1.0 ELSE 0.0 END
    + 0.2 * ln(CAST(n_words AS DOUBLE)) AS z
  FROM f)
SELECT doc_id,
  round(1.0 / (1.0 + exp(-z)), 6) AS model_score,
  round(1.0 / (1.0 + exp(-z)), 6) >= 0.5 AS keep
FROM z
""",
    tags=("llm", "text", "quality"),
)
def quality_model_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter the way a trained classifier deploys:
    Column-expression featurization → broadcast-literal coefficients →
    sigmoid → keep flag, constant-folded into one codegen'd scan."""
    return text.quality_model_score(load_table(spark, sf_dir, "documents"))


# C4 line-level cleaning. Fixture text carries no newlines (or any
# punctuation), so the query synthesizes a deterministic multi-line
# corpus from each document's 8-word chunks — every third line left
# without terminal punctuation — and the oracle replays the identical
# construction. The rules themselves (min words, terminal punctuation,
# phrase blocklist) are the operator's; planted-fixture pytests cover the
# blocklist branch the synthetic corpus cannot hit.
@register(
    "c4_line_filter",
    oracle=r"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
chunks AS (
  SELECT doc_id, CAST(s / 8 AS BIGINT) AS line_id,
    array_to_string(list_slice(w, s + 1, s + 8), ' ') ||
    CASE WHEN (s / 8) % 3 < 2 THEN '.' ELSE '' END AS line
  FROM ws, range(0, 2048) g(s) WHERE s < len(w) AND s % 8 = 0),
v AS (
  SELECT doc_id, line_id, line, trim(line) AS t,
    len(regexp_split_to_array(trim(line), '\s+')) AS nw,
    contains(lower(line), 'javascript') OR contains(lower(line), 'lorem ipsum')
      OR contains(lower(line), 'cookie') OR contains(lower(line), '{') AS blocked
  FROM chunks)
SELECT doc_id, line_id, line,
  CASE WHEN nw < 3 OR t = '' THEN 'short'
       WHEN NOT regexp_matches(t, '[.!?"]$') THEN 'no_terminal_punct'
       WHEN blocked THEN 'blocklist' END IS NULL AS kept,
  CASE WHEN nw < 3 OR t = '' THEN 'short'
       WHEN NOT regexp_matches(t, '[.!?"]$') THEN 'no_terminal_punct'
       WHEN blocked THEN 'blocklist' END AS reason
FROM v
""",
    tags=("llm", "text", "curation"),
    extra=True,
)
def c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning verdicts over a synthesized multi-line
    corpus (8-word chunk lines, every third line missing its terminal
    '.'): per line, kept + the first failing rule."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = text.chunk_documents(docs, chunk_words=8, overlap_words=0)
    line = F.concat(
        F.col("chunk_text"),
        F.when(F.col("chunk_id") % 3 < 2, F.lit(".")).otherwise(F.lit("")),
    )
    rebuilt = (
        chunks.select("doc_id", F.struct("chunk_id", line.alias("l")).alias("s"))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("s")), lambda s: s.l),
                "\n",
            ).alias("text")
        )
    )
    return text.clean_lines(rebuilt)


# Mojibake oracle fragments generated from the ONE mapping table
# (operators/text.MOJIBAKE_MAP) so engine and oracle can never drift.
# The synthetic corpus is pure ASCII, so the query plants corruption
# deterministically first (doc_id mod 5 buckets), then repairs it.
def _mojibake_fix_sql(expr: str) -> str:
    for bad, good in text.MOJIBAKE_MAP:
        expr = f"replace({expr}, '{bad}', '{good}')"
    return expr


def _mojibake_hits_sql(expr: str) -> str:
    return " + ".join(
        f"CAST((length({expr}) - length(replace({expr}, '{bad}', '')))"
        f" / {len(bad)} AS BIGINT)"
        for bad, _ in text.MOJIBAKE_MAP
    )


@register(
    "mojibake_repair",
    oracle=f"""
WITH corrupt AS (
  SELECT doc_id,
    CASE WHEN doc_id % 5 = 0 THEN replace(text, 'a', 'Ã©')
         WHEN doc_id % 5 = 1 THEN replace(text, 'th', 'â€™')
         ELSE text END AS t
  FROM documents)
SELECT doc_id,
  {_mojibake_hits_sql("t")} AS mojibake_hits,
  {_mojibake_fix_sql("t")} <> t AS was_fixed,
  md5({_mojibake_fix_sql("t")}) AS clean_digest
FROM corrupt
""",
    tags=("llm", "text", "curation"),
    extra=True,
)
def mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-quality stage: plant UTF-8-read-as-cp1252 corruption on
    two doc_id buckets of the (ASCII) corpus, then detect + repair it
    with text.fix_mojibake (chained JVM replace over the public digraph
    map — linear, shuffle-free). Output digests the repaired text so the
    driver hash never sorts raw unicode."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    corrupt = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.replace(t, F.lit("a"), F.lit("Ã©")))
        .when(F.col("doc_id") % 5 == 1, F.replace(t, F.lit("th"), F.lit("â€™")))
        .otherwise(t)
        .alias("text"),
    )
    fixed = text.fix_mojibake(corrupt)
    return fixed.select(
        "doc_id",
        "mojibake_hits",
        "was_fixed",
        F.md5(F.col("text")).alias("clean_digest"),
    )


@register(
    "domain_quality_flags",
    oracle=f"""
WITH {_URL_SQL},
q AS (SELECT doc_id, {_QUALITY_EXPR} AS quality_score FROM documents),
j AS (
  SELECT h.doc_id, h.domain, q.quality_score
  FROM hosted h JOIN q USING (doc_id)),
agg AS (
  SELECT domain, COUNT(*) AS domain_n_docs,
    round(CAST(SUM(CAST(quality_score AS DECIMAL(18,12))) AS DOUBLE)
          / COUNT(*), 6) AS domain_mean_quality
  FROM j WHERE domain IS NOT NULL GROUP BY 1)
SELECT j.doc_id, j.domain, agg.domain_n_docs, agg.domain_mean_quality,
       agg.domain_mean_quality < 0.5 AS low_quality_domain
FROM j LEFT JOIN agg USING (domain)
""",
    tags=("llm", "curation", "web", "quality"),
    extra=True,
)
def domain_quality_flags_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level reputation: registrable-domain mean quality joined
    back per document, flagging documents whose whole DOMAIN scores below
    threshold — the site-level filter that drops low-quality sources
    wholesale."""
    docs = load_table(spark, sf_dir, "documents")
    hosted = web.with_url_host(_docs_with_urls(spark, sf_dir))
    scored = hosted.select("doc_id", "domain").join(
        text.text_metrics(docs).select("doc_id", "quality_score"), "doc_id"
    )
    return web.domain_quality_flags(scored)


@register(
    "leakage_safe_split",
    oracle=f"""
WITH {_URL_SQL},
b AS (
  SELECT doc_id, domain,
    CAST(('0x' || substr(md5(domain), 1, 8)) AS BIGINT) AS bucket
  FROM hosted)
SELECT doc_id, domain, bucket,
  CASE WHEN bucket < {_TRAIN_HI} THEN 'train'
       WHEN bucket < {_VAL_HI} THEN 'val'
       ELSE 'test' END AS split
FROM b
""",
    tags=("llm", "sampling", "web"),
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-coherent train/val/test split keyed on the registrable
    domain: every page of a site lands in the same split, so near-dup
    and same-site correlations cannot leak between train and eval — the
    guard a per-document split cannot give."""
    hosted = web.with_url_host(_docs_with_urls(spark, sf_dir))
    return sampling.group_split(hosted, "domain")


@register(
    "token_budget_selection",
    oracle=f"""
WITH m AS (
  SELECT doc_id, {_QUALITY_EXPR} AS quality_score,
    len(string_split(text, ' ')) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, quality_score, n_tokens,
    SUM(n_tokens) OVER (
      ORDER BY quality_score DESC, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct
  FROM m WHERE quality_score IS NOT NULL)
SELECT doc_id, quality_score, n_tokens,
  CAST(ct AS BIGINT) AS cum_tokens, ct <= 10000 AS selected
FROM c
""",
    tags=("llm", "sampling", "quality"),
)
def token_budget_selection_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus selection under a token budget: documents in
    quality-descending order until 10k cumulative tokens — "train on the
    best N tokens". The global ordered cumsum runs on the two-level
    histogram scheme (W2's machinery); no single-partition window."""
    docs = load_table(spark, sf_dir, "documents")
    m = text.text_metrics(docs).select(
        "doc_id",
        "quality_score",
        F.col("n_words").alias("n_tokens"),
    )
    return sampling.token_budget_selection(m, 10_000)


# Intra-document line dedup over a synthesized multi-line corpus (2-word
# chunk lines — short enough that the fixture's synthetic vocabulary
# produces real within-document repeats: 246 duplicate groups at sf0.01).
@register(
    "intra_doc_line_dedup",
    oracle=r"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
lines AS (
  SELECT doc_id, CAST(s / 2 AS BIGINT) AS line_id,
    array_to_string(list_slice(w, s + 1, s + 2), ' ') AS line
  FROM ws, range(0, 2048) g(s) WHERE s < len(w) AND s % 2 = 0)
SELECT doc_id, line_id, line,
  row_number() OVER (PARTITION BY doc_id, line ORDER BY line_id) = 1 AS kept
FROM lines
""",
    tags=("llm", "text", "dedup", "curation"),
    extra=True,
)
def intra_doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style intra-document line dedup: flag every repeat of a
    line within its own page, keeping the first occurrence (nav menus /
    footers pasted between sections)."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = text.chunk_documents(docs, chunk_words=2, overlap_words=0)
    rebuilt = (
        chunks.select(
            "doc_id", F.struct("chunk_id", F.col("chunk_text").alias("l")).alias("s")
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("s")), lambda s: s.l),
                "\n",
            ).alias("text")
        )
    )
    return text.dedup_intra_doc_lines(rebuilt)


@register(
    "deterministic_shuffle",
    oracle="""
SELECT doc_id,
  row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
    AS shuffle_rank
FROM documents
""",
    tags=("llm", "sampling"),
    extra=True,
)
def deterministic_shuffle_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global corpus permutation (pre-training shuffle) by
    (md5(doc_id), doc_id) rank — W2's histogram-offset machinery on a
    hash-prefix key, no single-partition window."""
    return sampling.deterministic_shuffle(
        load_table(spark, sf_dir, "documents")
    )


@register(
    "bm25_topk",
    oracle="""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl),
q AS (SELECT DISTINCT doc_id AS query_id, term FROM tf WHERE doc_id % 100 = 0),
scored AS (
  SELECT q.query_id, t.doc_id,
    round(CAST(SUM(CAST(
      ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
      * (t.tf * (1.2 + 1.0))
        / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))
      AS DECIMAL(28,12))) AS DOUBLE), 6) AS bm25
  FROM tf t
  JOIN q ON t.term = q.term AND t.doc_id <> q.query_id
  JOIN dfreq d ON t.term = d.term
  JOIN dl l ON t.doc_id = l.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2)
SELECT query_id, rank, doc_id, bm25 FROM (
  SELECT query_id, doc_id, bm25,
    row_number() OVER (
      PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rank
  FROM scored) r
WHERE rank <= 10
""",
    tags=("llm", "text", "retrieval"),
    extra=True,
)
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 "more like this" retrieval: every doc_id % 100 = 0 document
    queries the corpus for its 10 most relevant documents — the inverted-
    index posting-list join expressed relationally, with retrieval-based
    decontamination and relevance curation as the downstream uses."""
    docs = load_table(spark, sf_dir, "documents")
    queries = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return text.bm25_topk(docs, queries, k=10)


@register(
    "weighted_sample_topk",
    oracle="""
WITH s AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
    ((CAST(('0x' || substr(md5(doc_id || ':42'), 1, 12)) AS BIGINT) + 1)
       / 281474976710656.0) / CAST(n_chars AS DOUBLE) AS xi
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
SELECT doc_id, weight, xi FROM s ORDER BY xi, doc_id LIMIT 500
""",
    tags=("llm", "sampling"),
    extra=True,
)
def weighted_sample_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential Poisson weighted sampling (Ohlsson): 500 documents drawn
    without replacement with inclusion probability ~ proportional to
    n_chars — the quality/length-weighted corpus subsampling step, as a
    pure function of (id, weight): ξ = hash-uniform/weight, global
    smallest-k via TakeOrderedAndProject (per-partition partial top-k, no
    global sort)."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.weighted_sample(docs, k=500, weight_col="n_chars")


@register(
    "temperature_mixture_lang",
    oracle="""
WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
z AS (SELECT SUM(CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(38,18))) AS z,
             SUM(n) AS total FROM c),
r AS (SELECT lang,
        LEAST(CAST(total AS DOUBLE) / sqrt(CAST(n AS DOUBLE))
                / CAST(z AS DOUBLE),
              8.0) AS rate
      FROM c, z),
d AS (SELECT doc_id, d.lang, rate FROM documents d JOIN r USING (lang)),
e AS (SELECT doc_id, lang, rate, CAST(s AS INT) AS epoch
      FROM d, range(0, 16) g(s) WHERE s <= CAST(FLOOR(rate) AS INT)),
u AS (SELECT *,
  CAST(('0x' || substr(md5(doc_id || ':' || epoch || ':42'), 1, 12))
       AS BIGINT) / 281474976710656.0 AS uu
  FROM e)
SELECT doc_id, lang, epoch
FROM u WHERE epoch < CAST(FLOOR(rate) AS INT) OR uu < rate - FLOOR(rate)
""",
    tags=("llm", "sampling"),
)
def temperature_mixture_lang_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha=0.5) language rebalancing: rare languages
    upsampled, dominant downsampled, expected corpus size preserved —
    per-group rates from one dimension-sized count aggregation with an
    exact DECIMAL normalizer, broadcast back, epochs via the shared
    hash-threshold Bernoulli."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.temperature_mixture(docs, alpha=0.5, group_col="lang")


@register(
    "media_frame_plan",
    # Recursive CTE instead of a bounded range(): no hard timestamp cap
    # to outgrow the data, and the NULL-duration branch mirrors
    # frame_sample_plan's explode_outer row (asset visible, sample NULL).
    oracle="""
WITH RECURSIVE v AS (
  SELECT doc_id AS asset_id, n_chars * 100 AS duration_ms
  FROM documents WHERE doc_id % 3 = 2),
f AS (
  SELECT asset_id, duration_ms, CAST(0 AS BIGINT) AS sample_ms
  FROM v WHERE duration_ms >= 0
  UNION ALL
  SELECT asset_id, duration_ms, sample_ms + 1000
  FROM f WHERE sample_ms + 1000 <= duration_ms)
SELECT asset_id, sample_ms FROM f
UNION ALL
SELECT asset_id, CAST(NULL AS BIGINT) AS sample_ms
FROM v WHERE duration_ms IS NULL
""",
    tags=("llm", "multimodal"),
)
def media_frame_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: one row per planned sample timestamp
    (stride 1000 ms) per video asset — the pure-DataFrame half of frame
    extraction (sequence+explode; decode rides extract_features'
    mapInPandas contract)."""
    assets = multimodal.media_from_documents(
        load_table(spark, sf_dir, "documents")
    )
    return multimodal.frame_sample_plan(assets, every_ms=1000)


@register(
    "semantic_decontamination",
    oracle="""
WITH corpus AS (SELECT * FROM embeddings WHERE vec_id % 17 != 0),
bench AS (SELECT * FROM embeddings WHERE vec_id % 17 = 0),
alist AS (
  SELECT list(CAST(embedding AS DOUBLE[]) ORDER BY vec_id) AS anchors
  FROM (SELECT vec_id, embedding FROM corpus ORDER BY vec_id LIMIT 24)),
cbits AS (
  SELECT e.vec_id,
    list_transform(al.anchors,
      x -> CASE WHEN list_dot_product(x, CAST(e.embedding AS DOUBLE[])) > 0
           THEN 1 ELSE 0 END) AS bits
  FROM corpus e, alist al),
cbuckets AS (
  SELECT vec_id, t.t AS tbl,
    bits[t.t*3+1]*4 + bits[t.t*3+2]*2 + bits[t.t*3+3] AS bucket
  FROM cbits, range(0, 8) t(t)),
qbits AS (
  SELECT e.vec_id,
    list_transform(al.anchors,
      x -> CASE WHEN list_dot_product(x, CAST(e.embedding AS DOUBLE[])) > 0
           THEN 1 ELSE 0 END) AS bits
  FROM bench e, alist al),
qbuckets AS (
  SELECT vec_id, t.t AS tbl,
    bits[t.t*3+1]*4 + bits[t.t*3+2]*2 + bits[t.t*3+3] AS bucket
  FROM qbits, range(0, 8) t(t)),
cand AS (
  SELECT DISTINCT q.vec_id AS vec_new, c.vec_id AS vec_base
  FROM qbuckets q JOIN cbuckets c USING (tbl, bucket)),
scored AS (
  SELECT vec_new, vec_base,
    list_dot_product(CAST(n.embedding AS DOUBLE[]),
                     CAST(b.embedding AS DOUBLE[]))
    / (sqrt(list_dot_product(CAST(n.embedding AS DOUBLE[]),
                             CAST(n.embedding AS DOUBLE[])))
     * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])))) AS cosine_sim
  FROM cand JOIN bench n ON vec_new = n.vec_id
            JOIN corpus b ON vec_base = b.vec_id),
hits AS (
  SELECT vec_base, vec_new, round(cosine_sim, 6) AS r_sim
  FROM scored WHERE cosine_sim >= 0.5),
best AS (
  SELECT vec_base, vec_new, r_sim,
    ROW_NUMBER() OVER (PARTITION BY vec_base
                       ORDER BY r_sim DESC, vec_new) AS rn
  FROM hits)
SELECT c.vec_id,
  CASE WHEN b.vec_new IS NOT NULL THEN 'contaminated' ELSE 'clean' END
    AS status,
  b.vec_new AS benchmark_vec_id,
  b.r_sim AS max_sim
FROM corpus c
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON c.vec_id = b.vec_base
""",
    tags=("llm", "similarity", "decontamination", "pipeline"),
    extra=True,
)
def semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level benchmark decontamination — the semantic twin of
    the n-gram `benchmark_decontamination`: every training-corpus vector
    near ANY benchmark/eval vector (cosine >= 0.5 through the banded LSH
    probe) is flagged with its closest benchmark id. Same scale contract
    as the incremental near-dup path: the bucket join is benchmark x
    corpus only (the corpus x corpus term never exists), the benchmark
    side is model-sized, and at 100 TB the corpus postings are the
    persisted bucketed index the benchmark set probes shuffle-free.
    Output: one row per corpus vector — (vec_id, status
    contaminated|clean, benchmark_vec_id, max_sim), best match broken by
    rounded-sim DESC then benchmark id ASC so the keep decision is
    deterministic under any partitioning."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 17 != 0)
    bench = emb.filter(F.col("vec_id") % 17 == 0)
    pairs = similarity.lsh_near_dup_pairs_incremental(
        corpus, bench, 0.5, n_tables=8, bits_per_table=3
    )
    w = Window.partitionBy("vec_base").orderBy(
        F.desc("r_sim"), F.asc("vec_new")
    )
    best = (
        pairs.withColumn("r_sim", F.round("cosine_sim", 6))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("vec_base").alias("vec_id"),
            F.col("vec_new").alias("benchmark_vec_id"),
            F.col("r_sim").alias("max_sim"),
        )
    )
    return corpus.select("vec_id").join(best, "vec_id", "left").select(
        "vec_id",
        F.when(
            F.col("benchmark_vec_id").isNotNull(), F.lit("contaminated")
        )
        .otherwise(F.lit("clean"))
        .alias("status"),
        "benchmark_vec_id",
        "max_sim",
    )


@register(
    "bpe_pair_counts",
    oracle="""
WITH toks AS (
  SELECT unnest(string_split(
    trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')), ' ')) AS word
  FROM documents),
vocab AS (
  SELECT word, COUNT(*) AS freq FROM toks
  WHERE length(word) >= 2 GROUP BY word),
pairs AS (
  SELECT substr(word, CAST(unnest(range(1, length(word))) AS INTEGER), 2)
    AS pair, freq
  FROM vocab),
agg AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM pairs GROUP BY pair)
SELECT rank, pair, pair_count FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair) AS rank,
         pair, pair_count
  FROM agg)
WHERE rank <= 50
""",
    tags=("llm", "text", "tokenizer"),
    extra=True,
)
def bpe_pair_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer induction over the corpus: ranked adjacent character-pair
    frequencies (the first BPE merge round's candidate table). The corpus
    reduces to its distinct-word vocabulary before any pair explode, and
    the rank window sees at most alphabet-squared rows — see
    `operators/text.py:bpe_pair_counts`."""
    return text.bpe_pair_counts(load_table(spark, sf_dir, "documents"))


# k-means oracle: the SQL replays every Lloyd step exactly — same seeds
# (k lowest ids), same left-to-right dot-product folds (list_dot_product
# == the engine's F.aggregate fold), same DECIMAL(38,12) sufficient
# statistics cast to DOUBLE before the division, same argmin tie-break
# (d2 then cid) — so assignments and distances hash-match bit-for-bit.
_KM_K, _KM_ITER, _KM_DIM = 4, 3, 64


def _kmeans_ctes(
    k: int,
    n_iter: int,
    dim: int,
    pts_select: str = "SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v"
    " FROM embeddings",
    pre_ctes: tuple[str, ...] = (),
    assign_select: str | None = None,
) -> list[str]:
    """CTE chain replaying fit (+ optional separate assign set), ending
    with ``af`` (id, cid, d2, rn; rn = 1 is the assignment) — shared by
    the plain oracle and compositions that keep transforming it."""
    d2 = (
        "p.xx - 2*list_dot_product(p.v, c.v)"
        " + list_dot_product(c.v, c.v)"
    )
    means = ",\n    ".join(
        f"CAST(SUM(CAST(v[{i + 1}] AS DECIMAL(38,12))) AS DOUBLE)"
        f" / CAST(COUNT(*) AS DOUBLE) AS m{i}"
        for i in range(dim)
    )
    lst = "[" + ", ".join(f"m.m{i}" for i in range(dim)) + "]"
    ctes = [
        *pre_ctes,
        f"pts AS ({pts_select})",
        "px AS (SELECT id, v, list_dot_product(v, v) AS xx FROM pts)",
        f"c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cid, v"
        f" FROM (SELECT id, v FROM pts ORDER BY id LIMIT {k}))",
    ]
    for t in range(1, n_iter + 1):
        ctes.append(
            f"a{t} AS (SELECT p.id, p.v, c.cid,\n"
            f"  ROW_NUMBER() OVER (PARTITION BY p.id ORDER BY {d2}, c.cid)"
            f" AS rn\n  FROM px p CROSS JOIN c{t - 1} c)"
        )
        ctes.append(
            f"m{t} AS (SELECT cid,\n    {means}\n"
            f"  FROM (SELECT a.cid, p.v FROM a{t} a JOIN pts p ON a.id = p.id"
            f" WHERE a.rn = 1) GROUP BY cid)"
        )
        ctes.append(
            f"c{t} AS (SELECT c.cid, CASE WHEN m.cid IS NULL THEN c.v"
            f" ELSE {lst} END AS v"
            f" FROM c{t - 1} c LEFT JOIN m{t} m USING (cid))"
        )
    # Final labeling pass: by default over the training points; with
    # assign_select, over a (usually larger) serving set — the
    # train-on-sample / assign-everything split.
    final_src = "px"
    if assign_select is not None:
        ctes.append(f"apts AS ({assign_select})")
        ctes.append(
            "apx AS (SELECT id, v, list_dot_product(v, v) AS xx FROM apts)"
        )
        final_src = "apx"
    ctes.append(
        f"af AS (SELECT p.id, c.cid, {d2} AS d2,\n"
        f"  ROW_NUMBER() OVER (PARTITION BY p.id ORDER BY {d2}, c.cid)"
        f" AS rn\n  FROM {final_src} p CROSS JOIN c{n_iter} c)"
    )
    return ctes


def _kmeans_oracle(
    k: int,
    n_iter: int,
    dim: int,
    pts_select: str = "SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v"
    " FROM embeddings",
    pre_ctes: tuple[str, ...] = (),
    out_id: str = "vec_id",
    assign_select: str | None = None,
) -> str:
    ctes = _kmeans_ctes(k, n_iter, dim, pts_select, pre_ctes, assign_select)
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"SELECT id AS {out_id}, CAST(cid AS INT) AS cluster_id,\n"
        "  CASE WHEN round(d2, 6) = 0 THEN 0.0 ELSE round(d2, 6) END AS d2\n"
        "FROM af WHERE rn = 1"
    )


@register(
    "kmeans_embeddings",
    oracle=_kmeans_oracle(_KM_K, _KM_ITER, _KM_DIM),
    tags=("llm", "clustering", "iterative"),
    extra=True,
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding corpus (semantic
    domain discovery / diversity-mixing stage): k=4, 3 fixed iterations,
    deterministic lowest-id seeding. Model (k x dim doubles) rides the
    driver; the data path is one persisted scan + one k-row shuffle per
    iteration — see operators/clustering.py."""
    from ssg_etl_spark.operators import clustering

    return clustering.kmeans_assign(
        load_table(spark, sf_dir, "embeddings"), k=_KM_K, n_iter=_KM_ITER
    )


# Hashed-TF oracle fragments (shared by the sparse query and the composed
# text->features->kmeans pipeline): same lowercase-letter-run tokens, same
# md5-byte cell, same exact-integer L2 norm (IEEE sqrt/division are
# correctly rounded, so weights replay bit-identically).
_HTF_DIM = 64
_HTF_CTES = (
    "tok AS (SELECT doc_id, unnest(string_split(trim(regexp_replace("
    "lower(text), '[^a-z]+', ' ', 'g')), ' ')) AS w FROM documents)",
    f"tf AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 2)) AS INTEGER)"
    f" % {_HTF_DIM} AS cell, COUNT(*) AS tf"
    f" FROM tok WHERE length(w) >= 1 GROUP BY 1, 2)",
    "nrm AS (SELECT doc_id, sqrt(CAST(SUM(tf * tf) AS DOUBLE)) AS nn"
    " FROM tf GROUP BY 1)",
)


@register(
    "hashed_tf_features",
    oracle=f"""
WITH {",".join(_HTF_CTES)}
SELECT tf.doc_id, tf.cell, tf.tf,
  round(CAST(tf.tf AS DOUBLE) / nrm.nn, 6) AS weight
FROM tf JOIN nrm ON tf.doc_id = nrm.doc_id
""",
    tags=("llm", "text", "features"),
    extra=True,
)
def hashed_tf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing vectorizer (hashing trick): tokens -> md5 cells ->
    L2-normalized hashed TF. Stateless (no vocabulary fit), one scan +
    one (doc, cell)-keyed count — see operators/text.py:hashed_tf."""
    tf = text.hashed_tf(load_table(spark, sf_dir, "documents"))
    return tf.select(
        "doc_id", "cell", "tf", F.round("weight", 6).alias("weight")
    )


_HTF_PTS = (
    f"SELECT tf.doc_id AS id, ["
    + ", ".join(
        f"SUM(CASE WHEN tf.cell = {i} THEN CAST(tf.tf AS DOUBLE) / nrm.nn"
        f" ELSE 0.0 END)"
        for i in range(_HTF_DIM)
    )
    + "] AS v FROM tf JOIN nrm ON tf.doc_id = nrm.doc_id GROUP BY tf.doc_id"
)


@register(
    "hashed_tf_kmeans",
    oracle=_kmeans_oracle(
        4, 2, _HTF_DIM, pts_select=_HTF_PTS, pre_ctes=_HTF_CTES, out_id="doc_id"
    ),
    tags=("llm", "text", "clustering", "pipeline"),
    extra=True,
)
def hashed_tf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end text clustering with zero model state: raw documents ->
    hashing-trick TF vectors -> Lloyd's k-means (k=4, 2 iterations) —
    the full "where do the vectors come from" path, every stage
    engine-replayable."""
    from ssg_etl_spark.operators import clustering

    dense = text.hashed_tf_dense(load_table(spark, sf_dir, "documents"))
    return clustering.kmeans_assign(
        dense, k=4, n_iter=2, id_col="doc_id", vec_col="vec"
    )


@register(
    "kmeans_sample_trained",
    oracle=_kmeans_oracle(
        _KM_K,
        2,
        _KM_DIM,
        pts_select="SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings WHERE vec_id % 5 = 0",
        assign_select="SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings",
    ),
    tags=("llm", "clustering", "serving"),
)
def kmeans_sample_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-on-sample / assign-everything: centroids fit on a 20%
    id-hash sample (k=4, 2 iterations), then the FULL corpus labeled via
    `kmeans_assign_precomputed` — whose plan is a pure scan+project with
    ZERO shuffles (the model rides the expression as folded literals).
    This is the 100 TB serving shape: training touches a bounded sample;
    labeling is one embarrassingly parallel map over everything."""
    from ssg_etl_spark.operators import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    cent = clustering.kmeans_fit(
        emb.filter(F.col("vec_id") % 5 == 0), k=_KM_K, n_iter=2
    )
    return clustering.kmeans_assign_precomputed(emb, cent)


def _rp_oracle(d_in: int, d_out: int) -> str:
    """Inline the SAME driver-generated sign matrix (md5 top bit) into
    DuckDB list_dot_product folds — identical literals, identical fold
    order, bit-identical projections."""
    signs = similarity.rp_sign_matrix(d_in, d_out)
    import math

    scale = repr(1.0 / math.sqrt(float(d_out)))
    cols = ",\n  ".join(
        "round(list_dot_product(v, ["
        + ", ".join(repr(s) for s in signs[j])
        + f"]) * {scale}, 6) AS y{j}"
        for j in range(d_out)
    )
    return f"""
WITH pts AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT vec_id,
  {cols}
FROM pts
"""


@register(
    "random_projection_16",
    oracle=_rp_oracle(64, 16),
    tags=("llm", "similarity", "projection"),
    extra=True,
)
def random_projection_16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss signed random projection 64 -> 16 dims: the
    shrink-before-ANN stage. Zero shuffles (matrix folded into the
    projection); one output column per reduced dimension so the driver
    can hash values."""
    emb = load_table(spark, sf_dir, "embeddings")
    proj = similarity.random_projection(emb, d_in=64, d_out=16)
    return proj.select(
        "vec_id",
        *[
            F.round(F.element_at("proj", j + 1), 6).alias(f"y{j}")
            for j in range(16)
        ],
    )


@register(
    "cluster_balanced_sample",
    oracle="WITH "
    + ",\n".join(_kmeans_ctes(_KM_K, 2, _KM_DIM))
    + """,
asg AS (SELECT id, cid FROM af WHERE rn = 1),
samp AS (
  SELECT id, cid,
    ROW_NUMBER() OVER (PARTITION BY cid
                       ORDER BY md5(CAST(id AS VARCHAR)), id) AS rn2
  FROM asg)
SELECT id AS vec_id, CAST(cid AS INT) AS cluster_id
FROM samp WHERE rn2 <= 25
""",
    tags=("llm", "clustering", "sampling", "pipeline"),
    extra=True,
)
def cluster_balanced_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-balanced sample: 25 items from each of 4 k-means
    clusters, selected by deterministic md5 order — equal semantic
    coverage for training mixtures (operators/clustering.py)."""
    from ssg_etl_spark.operators import clustering

    return clustering.cluster_balanced_sample(
        load_table(spark, sf_dir, "embeddings"), per_cluster=25, k=_KM_K, n_iter=2
    )


@register(
    "bigram_logprob",
    oracle="""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
pairs AS (
  SELECT doc_id, w[i] AS prev, w[i+1] AS cur
  FROM ws, range(1, 2048) g(i)
  WHERE len(w) >= 2 AND i <= len(w) - 1),
tfb AS (SELECT doc_id, prev, cur, COUNT(*) AS c FROM pairs GROUP BY 1, 2, 3),
cb AS (SELECT prev, cur, CAST(SUM(c) AS BIGINT) AS cfb FROM tfb GROUP BY 1, 2),
ctx AS (SELECT prev, CAST(SUM(cfb) AS BIGINT) AS cfp FROM cb GROUP BY 1),
terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
uni AS (SELECT term, COUNT(*) AS cf FROM terms GROUP BY 1),
tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS n_total FROM uni),
agg AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
    CAST(SUM(CAST(c * ln(
      0.75 * (CAST(cfb AS DOUBLE) / CAST(cfp AS DOUBLE))
      + 0.25 * (CAST(cf AS DOUBLE)
                / CAST((SELECT n_total FROM tot) AS DOUBLE)))
      AS DECIMAL(28,12))) AS DOUBLE) AS s
  FROM tfb JOIN cb USING (prev, cur) JOIN ctx USING (prev)
       JOIN uni ON cur = term
  GROUP BY 1)
SELECT doc_id, n_bigrams,
  round(s / CAST(n_bigrams AS DOUBLE), 6) AS mean_logprob
FROM agg
""",
    tags=("llm", "text", "quality"),
    extra=True,
)
def bigram_logprob_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM quality score (lambda = 0.75, matching the
    oracle's literals) — the perplexity-filter upgrade of
    unigram_logprob; see operators/text.py:bigram_logprob. Extra
    registry: locally oracle-verified."""
    return text.bigram_logprob(load_table(spark, sf_dir, "documents"))


@register(
    "lm_quality_cut",
    oracle="""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS c FROM terms GROUP BY 1, 2),
corpus AS (SELECT term, CAST(SUM(c) AS BIGINT) AS cf FROM tf GROUP BY 1),
tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS n_total FROM corpus),
scored AS (
  SELECT doc_id,
    round(CAST(SUM(CAST(c * ln(cf) AS DECIMAL(28,12))) AS DOUBLE)
            / CAST(SUM(c) AS DOUBLE)
          - ln(CAST((SELECT n_total FROM tot) AS DOUBLE)), 6)
      AS mean_logprob
  FROM tf JOIN corpus USING (term) GROUP BY 1),
thr AS (SELECT quantile_cont(mean_logprob, 0.8) AS t FROM scored)
SELECT doc_id, mean_logprob,
  round((SELECT t FROM thr), 6) AS threshold,
  mean_logprob >= (SELECT t FROM thr) AS kept
FROM scored
""",
    tags=("llm", "text", "quality", "pipeline"),
    extra=True,
)
def lm_quality_cut_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity-head cut: keep the top 20% of documents by
    corpus-self unigram LM score, threshold derived from the corpus's own
    80th percentile (operators/text.py:lm_quality_cut)."""
    return text.lm_quality_cut(load_table(spark, sf_dir, "documents"), 0.2)


@register(
    "kmeans_cluster_purity",
    oracle="WITH "
    + ",\n".join(_kmeans_ctes(_KM_K, 2, _KM_DIM))
    + """,
asg AS (SELECT a.id, a.cid, e.label
        FROM af a JOIN embeddings e ON a.id = e.vec_id WHERE a.rn = 1),
lc AS (SELECT cid, label, COUNT(*) AS n FROM asg GROUP BY 1, 2),
tot AS (SELECT cid, CAST(SUM(n) AS BIGINT) AS n_points FROM lc GROUP BY 1),
top AS (
  SELECT cid, label AS majority_label, n AS n_majority,
    ROW_NUMBER() OVER (PARTITION BY cid ORDER BY n DESC, label) AS rn
  FROM lc)
SELECT t.cid AS cluster_id, tot.n_points, t.majority_label,
  t.n_majority,
  round(CAST(t.n_majority AS DOUBLE) / CAST(tot.n_points AS DOUBLE), 4)
    AS purity
FROM top t JOIN tot ON t.cid = tot.cid WHERE t.rn = 1
""",
    tags=("llm", "clustering", "evaluation"),
    extra=True,
)
def kmeans_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering evaluation: per-cluster label purity (majority-label
    share) of the k-means assignment against the embeddings' ground-truth
    label column — the quality gate before a clustering drives mixing or
    curation decisions. Per-cluster counts are a (cluster, label)
    dimension table; nothing corpus-sized converges."""
    from pyspark.sql.window import Window

    from ssg_etl_spark.operators import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    asg = clustering.kmeans_assign(emb, k=_KM_K, n_iter=2).join(
        emb.select("vec_id", "label"), "vec_id"
    )
    lc = asg.groupBy("cluster_id", "label").agg(F.count(F.lit(1)).alias("n"))
    # Cluster totals ride a window over the SAME cluster_id partitioning
    # as the majority pick (r13): the former groupBy + join-back consumed
    # the (cluster, label) table twice, and lc was unpersisted, so the
    # whole assignment subtree evaluated twice (duplicated stages in the
    # metrics). One window partitioning serves both the sum and the
    # row_number; same rows out.
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n"), F.asc("label"))
    w_all = Window.partitionBy("cluster_id")
    return (
        lc.withColumn("n_points", F.sum("n").over(w_all))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "cluster_id",
            "n_points",
            F.col("label").alias("majority_label"),
            F.col("n").alias("n_majority"),
            F.round(
                F.col("n").cast("double") / F.col("n_points").cast("double"),
                4,
            ).alias("purity"),
        )
    )


@register(
    "kmeans_silhouette",
    oracle="WITH "
    + ",\n".join(_kmeans_ctes(_KM_K, 2, _KM_DIM))
    + """,
s1 AS (SELECT id, cid, d2 FROM af WHERE rn = 1),
s2 AS (SELECT id, d2 AS d2b FROM af WHERE rn = 2),
sp AS (
  SELECT s1.cid,
    CASE WHEN greatest(sqrt(greatest(s1.d2, 0.0)),
                       sqrt(greatest(s2.d2b, 0.0))) = 0 THEN 0.0
         ELSE (sqrt(greatest(s2.d2b, 0.0)) - sqrt(greatest(s1.d2, 0.0)))
              / greatest(sqrt(greatest(s1.d2, 0.0)),
                         sqrt(greatest(s2.d2b, 0.0))) END AS s
  FROM s1 JOIN s2 ON s1.id = s2.id)
SELECT cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_points,
  round(CAST(SUM(CAST(s AS DECIMAL(28,12))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 4) AS mean_silhouette
FROM sp GROUP BY 1
""",
    tags=("llm", "clustering", "evaluation"),
    extra=True,
)
def kmeans_silhouette_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette per k-means cluster — the
    scalable clustering-quality signal (operators/clustering.py:
    kmeans_silhouette)."""
    from ssg_etl_spark.operators import clustering

    return clustering.kmeans_silhouette(
        load_table(spark, sf_dir, "embeddings"), k=_KM_K, n_iter=2
    )


@register(
    "token_mixture_plan",
    oracle="""
WITH w AS (SELECT * FROM (VALUES ('src0', 0.4), ('src1', 0.3),
                                 ('src2', 0.2), ('src3', 0.1)) t(source, w)),
tot AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS toks
        FROM documents GROUP BY 1),
r AS (SELECT w.source, (50000 * w.w) / toks AS rate
      FROM w JOIN tot USING (source)),
d AS (SELECT doc_id, documents.source, rate
      FROM documents JOIN r ON documents.source = r.source),
e AS (SELECT doc_id, source, rate, CAST(s AS INT) AS epoch
      FROM d, range(0, 128) g(s) WHERE s <= CAST(FLOOR(rate) AS INT)),
u AS (SELECT *,
  CAST(('0x' || substr(md5(doc_id || ':' || epoch || ':42'), 1, 12))
       AS BIGINT) / 281474976710656.0 AS uu
  FROM e)
SELECT doc_id, source, epoch, round(rate, 12) AS rate
FROM u WHERE epoch < CAST(FLOOR(rate) AS INT) OR uu < rate - FLOOR(rate)
""",
    tags=("llm", "sampling", "recipe"),
    extra=True,
)
def token_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained mix recipe solved end-to-end: 50k tokens split
    40/30/20/10 over four sources — per-source epoch rates derived from
    the corpus's actual token totals (one k-row aggregation), then the
    zero-shuffle epoch-explode sample, rate carried per row for audit
    (operators/sampling.py:plan_token_mixture)."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.plan_token_mixture(
        docs,
        {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        budget_tokens=50_000,
        token_col="n_chars",
    ).select("doc_id", "source", "epoch", "rate")


# ------------------------------------------------------------- SemDeDup

_SD_TAU = 0.3


def _semdedup_oracle(k: int, n_iter: int, dim: int, tau: float) -> str:
    """Replay SemDeDup end to end: the shared k-means CTE chain (fit +
    final assignment in ``af``), then centroid-distance ranking inside
    each cluster and the EXISTS-style earlier-ranked cosine probe. The
    cosine folds left-to-right exactly as the DataFrame side's
    similarity.dot; zero-norm vectors are excluded from PAIRING (NaN
    ordering differs across engines) but stay in the output."""
    cos = (
        "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v))"
        " * sqrt(list_dot_product(b.v, b.v)))"
    )
    ctes = _kmeans_ctes(k, n_iter, dim)
    ctes += [
        "mem AS (SELECT af.id, af.cid,"
        " CASE WHEN round(af.d2, 6) = 0 THEN 0.0 ELSE round(af.d2, 6) END"
        " AS d2 FROM af WHERE rn = 1)",
        "rk AS (SELECT m.id, m.cid, p.v,"
        " ROW_NUMBER() OVER (PARTITION BY m.cid ORDER BY m.d2, m.id) AS rk"
        " FROM mem m JOIN pts p ON m.id = p.id)",
        f"dup AS (SELECT DISTINCT b.id FROM rk a JOIN rk b"
        f" ON a.cid = b.cid AND a.rk < b.rk"
        f" WHERE sqrt(list_dot_product(a.v, a.v)) > 0"
        f" AND sqrt(list_dot_product(b.v, b.v)) > 0"
        f" AND {cos} >= {tau})",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT m.id AS vec_id, CAST(m.cid AS INT) AS cluster_id,\n"
        "  (d.id IS NULL) AS is_kept\n"
        "FROM mem m LEFT JOIN dup d ON m.id = d.id"
    )


@register(
    "semdedup_embeddings",
    oracle=_semdedup_oracle(_KM_K, _KM_ITER, _KM_DIM, _SD_TAU),
    tags=("llm", "dedup", "clustering", "semantic"),
)
def semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540): semantic dedup / diversity pruning by
    cluster-scoped cosine — k-means partitions the embedding space, then
    a member is dropped iff an earlier-ranked member of ITS OWN cluster
    (centroid-nearest-first order) sits within cosine tau. Complexity
    Σ|cluster|² — never corpus×corpus; at scale k rises with N to bound
    cluster size, keeping the pair stage ~linear. Complements LSH
    near-dup: buckets are LEARNED semantic regions, so moderate-cosine
    redundancy is found (the published diversity-pruning use; tau here
    is low because the synthetic corpus has no verbatim near-dups)."""
    return dedup.semdedup_flags(
        load_table(spark, sf_dir, "embeddings"),
        k=_KM_K,
        n_iter=_KM_ITER,
        tau=_SD_TAU,
    )
