"""Deduplication operators for training-data pipelines.

- exact_dedup: hash-groupBy on normalized text (one shuffle, min-id winner).
- minhash_lsh_pairs: shingle -> k minhashes -> banded LSH buckets ->
  candidate pairs -> exact-Jaccard verification. The scale path: candidate
  generation is a self-join on (band, signature) buckets — linear in corpus
  size + bucket collisions, never all-pairs.
- simhash64: 64-bit SimHash via per-bit vote aggregation (64 JVM sum
  columns, no UDF).
- ngram_jaccard_pairs: exact all-pairs Jaccard (the small-N oracle path /
  verifier; LSH is the 100 TB path).
- embedding_cosine_pairs: near-duplicate pairs by cosine over an embedding
  column (brute-force pair join; the ANN variant lives in similarity.py).

Hashing is md5-derived everywhere (portable to the DuckDB oracle — see
functions.textfns.hash60). Per-seed rehash h_i(s) = hash60(i || ':' || s)
avoids 128-bit modular arithmetic and stays engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import hash60, hash60_sql, shingles_expr_sql, tokens, tokens_sql, word_shingles

K_HASHES = 64
BANDS = 32  # r = K/BANDS = 2 rows per band


def normalized(c: Column) -> Column:
    """lower + whitespace-collapse (the dedup key normalization)."""
    return F.concat_ws(" ", tokens(F.lower(c)))


def normalized_sql(expr: str) -> str:
    return f"array_to_string({tokens_sql(f'lower({expr})')}, ' ')"


# --------------------------------------------------------------- exact dedup


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per normalized-text hash.

    One shuffle on the 128-bit content hash; at 100 TB this is the classic
    first pass (hash is tiny vs text; shuffle carries (hash, id) pairs only).
    """
    h = F.md5(normalized(F.col(text_col)))
    return (
        df.select(F.col(id_col), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def exact_dedup_sql(source: str = "documents") -> str:
    return f"""
SELECT md5(norm) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
FROM (SELECT doc_id, {normalized_sql('text')} AS norm FROM {source})
GROUP BY content_hash
"""


# ------------------------------------------------------------- MinHash + LSH


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = K_HASHES
) -> DataFrame:
    """k-minhash signature per doc: explode distinct shingles, k min-aggs.

    One shuffle on id; signature computation is k JVM min() aggregates over
    md5-derived shingle hashes (no UDF, no 128-bit arithmetic).
    """
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col))).alias("shingle")
    )
    # Kirsch-Mitzenmacher double hashing: h_i = (h1 + i*h2) mod p from TWO
    # md5-derived base hashes per shingle instead of k independent md5s
    # (k=64 md5+hex-conv per shingle measured 10x slower at 5k docs).
    # 31-bit values: within-doc collision over ~100 shingles is ~1e-6.
    p = (1 << 31) - 1
    h1 = F.pmod(hash60(F.col("shingle")), F.lit(p))
    h2 = F.pmod(hash60(F.concat(F.lit("b:"), F.col("shingle"))), F.lit(p)) + 1
    mins = [F.min(F.pmod(h1 + F.lit(i) * h2, F.lit(p))).alias(f"mh{i}") for i in range(k)]
    return sh.groupBy(id_col).agg(*mins)


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", k: int = K_HASHES, bands: int = BANDS
) -> DataFrame:
    """Banded LSH: docs sharing any band signature become candidates.

    Self-join happens per (band, band_sig) bucket — the shuffle key — so
    cost scales with bucket occupancy, not corpus^2."""
    r = k // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("_", *[F.col(f"mh{b * r + j}") for j in range(r)]).alias("sig"),
        )
        for b in range(bands)
    ]
    buckets = sigs.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.sig").alias("sig"))
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-3gram Jaccard on candidate pairs (join back to shingle sets)."""
    sh = df.select(F.col(id_col), word_shingles(F.col(text_col)).alias("sh"))
    out = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("long"))
        .withColumn(
            "uni",
            (F.size("sh_a") + F.size("sh_b") - F.col("inter")).cast("long"),
        )
        .withColumn(
            "jaccard",
            F.when(F.col("uni") > 0, F.col("inter").cast("double") / F.col("uni")).otherwise(0.0),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "inter", "uni", "jaccard")


def minhash_lsh_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", threshold: float = 0.5
) -> DataFrame:
    sigs = minhash_signatures(df, text_col, id_col)
    cands = lsh_candidate_pairs(sigs, id_col)
    return jaccard_verify(cands, df, text_col, id_col, threshold)


def ngram_jaccard_pairs_sql(source: str = "documents", threshold: float = 0.5) -> str:
    """Oracle: exact all-pairs Jaccard (recomputes what LSH+verify finds —
    at verification threshold >= LSH design threshold, recall is ~1 by the
    banding bound 1-(1-s^r)^b; parity failures would expose missed pairs)."""
    sh = shingles_expr_sql("w")
    return f"""
WITH s AS (
  SELECT doc_id, {sh} AS sh
  FROM (SELECT doc_id, {tokens_sql('text')} AS w FROM {source})
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_intersect(a.sh, b.sh))::BIGINT AS inter,
       (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::BIGINT AS uni,
       CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
            THEN len(list_intersect(a.sh, b.sh))::DOUBLE
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
            ELSE 0.0 END AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
           THEN len(list_intersect(a.sh, b.sh))::DOUBLE
                / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
           ELSE 0.0 END >= {threshold}
"""


# ------------------------------------------------------------------- SimHash


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash: per-token 60-bit md5 hash, per-bit +/-1 votes summed,
    sign -> bit. Explode + one groupBy with 60 JVM sum() columns — stays in
    whole-stage codegen, no UDF. (60 bits used: hash60 yields 15 hex chars.)"""
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    h = hash60(F.col("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(60)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    sim = None
    for b in range(60):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << b).cast("long")
        sim = term if sim is None else sim + term
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash64_sql(source: str = "documents") -> str:
    votes = ", ".join(
        f"sum(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(60)
    )
    recomb = " + ".join(f"(CASE WHEN v{b} > 0 THEN 1::BIGINT ELSE 0 END) * {1 << b}::BIGINT" for b in range(60))
    return f"""
SELECT doc_id, {recomb} AS simhash
FROM (
  SELECT doc_id, {votes}
  FROM (
    SELECT doc_id, {hash60_sql('tok')} AS h
    FROM (SELECT doc_id, unnest({tokens_sql('text')}) AS tok FROM {source})
  )
  GROUP BY doc_id
)
"""


# --------------------------------------------------- embedding cosine dedup


def embedding_cosine_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate pairs by cosine similarity — exact, in two phases.

    Phase 1 prunes: a numpy block-matmul against a broadcast corpus matrix
    scores all pairs and keeps those with cos >= threshold - 1e-6. The
    matmul differs from a sequential fold by at most ~1e-12 relative, so the
    margin makes the prefilter provably lossless. Phase 2 recomputes the
    surviving (few) pairs with the same sequential double fold the oracle
    uses — bit-exact output, rounded to 9 dp.

    All-pairs cost lives in phase 1 as one dense matmul (vectorized,
    embarrassingly partition-parallel, no JVM fold per element — 25x over
    the codegen'd zip_with fold at 5k vectors). The O(n^2) is inherent to
    the exact verifier; the scale path is similarity.ann_lsh_topk."""
    import numpy as np
    import pandas as pd

    # broadcast the (normalized) corpus matrix — the exact verifier assumes
    # it fits the broadcast budget (5k x 64 = 2.5 MB here; ~GBs are fine);
    # beyond that, use the ANN path and verify samples
    spark = df.sparkSession
    corpus = df.select(F.col(id_col), F.col(vec_col)).toPandas()
    ids = corpus[id_col].to_numpy()
    M = np.stack([np.asarray(v, dtype=np.float64) for v in corpus[vec_col]])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, M))
    margin = threshold - 1e-6

    def prefilter(batches):
        bids, bm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            sims = Q @ bm.T
            qa, ca = np.nonzero(sims >= margin)
            out = pd.DataFrame(
                {
                    "id_a": pdf[id_col].to_numpy()[qa],
                    "id_b": bids[ca],
                }
            )
            out = out[out["id_a"] < out["id_b"]]
            if len(out):
                yield out

    id_t = df.schema[id_col].dataType.simpleString()
    cands = df.select(id_col, vec_col).mapInPandas(
        prefilter, schema=f"id_a {id_t}, id_b {id_t}"
    )

    # phase 2: exact sequential fold on candidates only (oracle semantics)
    v = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)),
    )
    a = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), F.col("norm").alias("na"))
    b = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("cos", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 9).alias("cosine"))
    )


def embedding_cosine_pairs_sql(source: str = "embeddings", threshold: float = 0.95) -> str:
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v,
         sqrt(list_reduce(list_prepend(0.0, list_transform(embedding, x -> (x::DOUBLE)*(x::DOUBLE))), (a, x) -> a + x)) AS norm
  FROM {source}
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])), (acc, x) -> acc + x)
             / (a.norm * b.norm), 9) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])), (acc, x) -> acc + x)
      / (a.norm * b.norm) >= {threshold}
"""
