"""Catalog entries for the training-data-pipeline operators.

Registers the text / dedup / similarity / multimodal operator families
(SURVEY stretch surface; BASELINE.json north star) over the testdata
``documents`` and ``embeddings`` tables, each with an exactly-mirrored
DuckDB oracle. The repetitive SQL (minhash components, LSH planes,
per-bit simhash votes) is generated programmatically so both sides stay
pinned to the same md5-based constructions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup, multimodal, similarity, text
from .testdata_queries import _q, _t

# Shared tokenization fragment (must mirror operators.text.tokens)
_TOK = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')"
_DTOK = f"list_distinct({_TOK})"


def _sql_stop_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in text.STOPWORDS[lang]) + "]"


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@_q(
    "text_token_stats",
    "text: token counting (whitespace tokenizer)",
    f"""
    WITH toks AS (SELECT doc_id, {_TOK} AS tok FROM documents)
    SELECT doc_id, len(tok) AS n_tokens, len(list_distinct(tok)) AS n_unique,
           CAST(list_sum(list_transform(tok, t -> length(t))) AS DOUBLE) / len(tok)
               AS avg_token_len
    FROM toks
    """,
)
def text_token_stats(spark, sf_dir):
    return text.token_stats(_t(spark, sf_dir, "documents"))


@_q(
    "text_quality",
    "text: quality scoring (length/punct/stopword ratios)",
    f"""
    WITH base AS (
        SELECT doc_id, text, {_TOK} AS tok, length(text) AS n_chars FROM documents
    )
    SELECT doc_id, n_chars, len(tok) AS n_tokens,
           CAST(n_chars - length(regexp_replace(lower(text), '[^a-z0-9 \t\n]', '', 'g'))
                AS DOUBLE) / n_chars AS punct_ratio,
           CAST(n_chars - length(regexp_replace(lower(text), '[0-9]', '', 'g'))
                AS DOUBLE) / n_chars AS digit_ratio,
           CAST(len(list_intersect(list_distinct(tok), {_sql_stop_list('en')}))
                AS DOUBLE) / greatest(len(list_distinct(tok)), 1) AS stopword_ratio,
           CAST(len(list_distinct(tok)) AS DOUBLE) / greatest(len(tok), 1)
               AS type_token_ratio
    FROM base
    """,
)
def text_quality(spark, sf_dir):
    return text.quality_features(_t(spark, sf_dir, "documents"))


_LANG_SCORE_SQL = ",\n           ".join(
    f"len(list_intersect(dtok, {_sql_stop_list(lang)})) AS score_{lang}"
    for lang in text.LANG_ORDER
)
_LANG_PICK_SQL = "CASE " + " ".join(
    "WHEN "
    + " AND ".join(
        f"score_{lang} >= score_{other}" for other in text.LANG_ORDER if other != lang
    )
    + f" THEN '{lang}'"
    for lang in text.LANG_ORDER
) + " ELSE 'en' END"


@_q(
    "text_lang_id",
    "text: stopword-hit language-ID heuristic",
    f"""
    WITH toks AS (SELECT doc_id, {_DTOK} AS dtok FROM documents),
    scored AS (
        SELECT doc_id,
           {_LANG_SCORE_SQL}
        FROM toks
    )
    SELECT doc_id, score_en, score_de, score_es, score_fr, score_zh,
           {_LANG_PICK_SQL} AS detected_lang
    FROM scored
    """,
)
def text_lang_id(spark, sf_dir):
    return text.lang_id(_t(spark, sf_dir, "documents"))


@_q(
    "text_fingerprint",
    "text: whitespace-normalized content fingerprint",
    """
    SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    return text.fingerprint(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

@_q(
    "dedup_exact",
    "dedup: exact content-hash groupBy",
    """
    SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


from ..operators.dedup import MINHASH_PARAMS, MINHASH_PRIME  # noqa: E402

_MH_COMPONENTS_SQL = ",\n           ".join(
    f"list_min(list_transform(th, h -> ({a} * h + {b}) % {MINHASH_PRIME})) AS mh_{i}"
    for i, (a, b) in enumerate(MINHASH_PARAMS)
)
_MH_BANDS_SQL = "\n        UNION ALL\n        ".join(
    f"SELECT doc_id, {b} AS band, md5(concat_ws('|', mh_{2 * b}, mh_{2 * b + 1})) AS key FROM sig"
    for b in range(4)
)


# the full minhash-LSH candidate-pair pipeline in DuckDB SQL, shared by
# the pairs oracle and the connected-components oracle below
_MH_PAIRS_CTES = f"""toks AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    shingled AS (
        SELECT doc_id,
               CASE WHEN len(tok) >= 3 THEN list_distinct(list_transform(
                        generate_series(0, len(tok) - 3),
                        i -> concat_ws(' ', tok[i+1], tok[i+2], tok[i+3])))
                    ELSE [] END AS s
        FROM toks
    ),
    hashed AS (
        SELECT doc_id,
               list_transform(s, t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)
                                      & 4294967295) AS th
        FROM shingled WHERE len(s) > 0
    ),
    sig AS (
        SELECT doc_id,
           {_MH_COMPONENTS_SQL}
        FROM hashed
    ),
    bands AS (
        {_MH_BANDS_SQL}
    ),
    mh_pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared_bands
        FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
             AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )"""


@_q(
    "dedup_minhash_lsh",
    "dedup: MinHash signatures + banded LSH candidate pairs",
    f"""
    WITH {_MH_PAIRS_CTES}
    SELECT id_a, id_b, n_shared_bands FROM mh_pairs
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    return dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"))


@_q(
    "dedup_minhash_incr",
    "dedup: incremental MinHash-LSH — daily delta vs persisted corpus band index",
    f"""
    WITH {_MH_PAIRS_CTES}
    SELECT id_a, id_b, n_shared_bands FROM mh_pairs
    WHERE id_a % 10 = 0 OR id_b % 10 = 0
    """,
)
def dedup_minhash_incr(spark, sf_dir):
    # day-1-corpus / day-2-delta split of the same table: the operator
    # must return exactly the batch pairs involving delta docs without
    # re-hashing the corpus (index side is band entries only)
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    delta = docs.where(F.col("doc_id") % 10 == 0)
    return dedup.minhash_lsh_pairs_incremental(
        delta, dedup.minhash_band_index(corpus)
    )


@_q(
    "dedup_clusters",
    "dedup: connected components over near-dup pairs (iterative min-label "
    "propagation; cluster_id = min reachable doc_id)",
    f"""
    WITH RECURSIVE {_MH_PAIRS_CTES},
    edges AS (
        SELECT id_a AS s, id_b AS d FROM mh_pairs
        UNION
        SELECT id_b, id_a FROM mh_pairs
    ),
    reach(node, label) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.node
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM reach GROUP BY node
    """,
)
def dedup_clusters(spark, sf_dir):
    pairs = dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"))
    cc = dedup.connected_components(pairs)
    return cc.select(F.col("node_id").alias("doc_id"), "cluster_id")


@_q(
    "array_funcs",
    "array/higher-order surface: size, element_at, slice+sort, contains, "
    "exists, filter-count — outputs kept scalar (the driver's pandas "
    "canonicalizer cannot hash array cells; r1: approx_stats)",
    f"""
    WITH toks AS (SELECT doc_id, {_TOK} AS tok FROM documents)
    SELECT doc_id,
           len(tok) AS n_tok,
           tok[1] AS first_tok,
           array_to_string(list_sort(tok[1:3]), '|') AS head3_sorted,
           list_contains(tok, 'the') AS has_the,
           len(list_filter(tok, t -> length(t) > 6)) AS n_long,
           len(list_filter(tok, t -> length(t) > 6)) > 0 AS any_long
    FROM toks
    """,
)
def array_funcs(spark, sf_dir):
    from ..operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    tok = F.col("tok")
    long_toks = F.filter(tok, lambda t: F.length(t) > 6)
    return docs.select("doc_id", tokens("text").alias("tok")).select(
        "doc_id",
        F.size(tok).cast("long").alias("n_tok"),
        # get (0-based) over element_at: ANSI mode makes element_at THROW
        # on out-of-bounds, DuckDB's tok[1] yields NULL — get matches
        F.get(tok, 0).alias("first_tok"),
        F.concat_ws("|", F.sort_array(F.slice(tok, 1, 3))).alias("head3_sorted"),
        F.array_contains(tok, "the").alias("has_the"),
        F.size(long_toks).cast("long").alias("n_long"),
        F.exists(tok, lambda t: F.length(t) > 6).alias("any_long"),
    )


@_q(
    "dedup_clusters_star",
    "dedup: connected components via alternating large-star/small-star "
    "rounds (O(log n) rounds vs propagation's O(diameter)) — same "
    "clusters, same recursive-CTE oracle",
    f"""
    WITH RECURSIVE {_MH_PAIRS_CTES},
    edges AS (
        SELECT id_a AS s, id_b AS d FROM mh_pairs
        UNION
        SELECT id_b, id_a FROM mh_pairs
    ),
    reach(node, label) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.node
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM reach GROUP BY node
    """,
)
def dedup_clusters_star(spark, sf_dir):
    pairs = dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"))
    cc = dedup.connected_components_star(pairs)
    return cc.select(F.col("node_id").alias("doc_id"), "cluster_id")


_NGRAM_JACCARD_CTES = f"""toks AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    sh AS (
        SELECT doc_id,
               CASE WHEN len(tok) >= 3 THEN list_distinct(list_transform(
                        generate_series(0, len(tok) - 3),
                        i -> concat_ws(' ', tok[i+1], tok[i+2], tok[i+3])))
                    ELSE [] END AS s
        FROM toks
    ),
    sized AS (SELECT doc_id, s, len(s) AS n_sh FROM sh WHERE len(s) > 0),
    inv AS (SELECT doc_id, unnest(s) AS shingle FROM sized),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )"""


@_q(
    "dedup_ngram_jaccard",
    "dedup: word-trigram Jaccard pairs via inverted-index join",
    f"""
    WITH {_NGRAM_JACCARD_CTES}
    SELECT i.id_a, i.id_b, i.n_inter,
           CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) AS jaccard
    FROM inter i
    JOIN sized sa ON sa.doc_id = i.id_a
    JOIN sized sb ON sb.doc_id = i.id_b
    WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.1
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.1)


@_q(
    "dedup_ngram_incr",
    "dedup: incremental word-trigram Jaccard — daily delta vs persisted "
    "inverted shingle index (exact for delta-involving pairs)",
    f"""
    WITH {_NGRAM_JACCARD_CTES}
    SELECT i.id_a, i.id_b, i.n_inter,
           CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) AS jaccard
    FROM inter i
    JOIN sized sa ON sa.doc_id = i.id_a
    JOIN sized sb ON sb.doc_id = i.id_b
    WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.1
      AND (i.id_a % 10 = 0 OR i.id_b % 10 = 0)
    """,
)
def dedup_ngram_incr(spark, sf_dir):
    # same day-1-corpus / day-2-delta split as dedup_minhash_incr: the
    # operator must return exactly the batch pairs involving delta docs
    # from the corpus's persisted inverted index, never re-shingling it
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    delta = docs.where(F.col("doc_id") % 10 == 0)
    return dedup.ngram_jaccard_pairs_incremental(
        delta, dedup.ngram_shingle_index(corpus), threshold=0.1
    )


_SIMHASH_SQL_FP = (
    "list_sum(list_transform(generate_series(0, 15), b -> CASE WHEN "
    "2 * len(list_filter(tok, t -> "
    "(CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) >> b) & 1 = 1)) > len(tok) "
    "THEN (1::BIGINT << b) ELSE 0 END))"
)


@_q(
    "dedup_simhash",
    "dedup: 16-bit SimHash fingerprint (per-bit majority vote)",
    f"""
    WITH toks AS (SELECT doc_id, {_DTOK} AS tok FROM documents)
    SELECT doc_id, CAST({_SIMHASH_SQL_FP} AS BIGINT) AS simhash FROM toks
    """,
)
def dedup_simhash(spark, sf_dir):
    return dedup.simhash(_t(spark, sf_dir, "documents"))


_SIMHASH_BLOCKS_SQL = "\n        UNION ALL\n        ".join(
    f"SELECT doc_id, simhash, {b} AS blk, (simhash >> {b * 4}) & 15 AS val FROM fp"
    for b in range(4)
)


@_q(
    "dedup_simhash_pairs",
    "dedup: SimHash near-dup pairs via block-LSH + hamming filter",
    f"""
    WITH toks AS (SELECT doc_id, {_DTOK} AS tok FROM documents),
    fp AS (SELECT doc_id, CAST({_SIMHASH_SQL_FP} AS BIGINT) AS simhash FROM toks),
    blocks AS (
        {_SIMHASH_BLOCKS_SQL}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.simhash AS sh_a, b.simhash AS sh_b
        FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.val = b.val
             AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
    """,
)
def dedup_simhash_pairs(spark, sf_dir):
    out = dedup.simhash_near_pairs(_t(spark, sf_dir, "documents"))
    from pyspark.sql import functions as F2

    return out.withColumn("hamming", F2.col("hamming").cast("int"))


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

# In-order left folds (list_reduce) mirror Spark's F.aggregate exactly,
# so double accumulation is bit-identical on both engines.
_COS_SQL = (
    "list_reduce(list_transform(generate_series(1, len(e.embedding)), "
    "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)), "
    "(a, b) -> a + b) / (norm_e * norm_q)"
)
_NORM_SQL = (
    "sqrt(list_reduce(list_transform({v}, x -> "
    "CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))"
)


@_q(
    "sim_cosine_topk",
    "similarity: exact brute-force cosine top-k per query vector",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qvec,
               {_NORM_SQL.format(v='embedding')} AS norm_q
        FROM embeddings WHERE vec_id < 3
    ),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               {_COS_SQL.replace('norm_e', _NORM_SQL.format(v='e.embedding'))} AS cosine
        FROM embeddings e, q WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= 5
    """,
)
def sim_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.cosine_topk(emb, queries, k=5)


@_q(
    "sim_cosine_pairs",
    "dedup/similarity: all-pairs cosine over threshold (EXACT baseline; "
    "O(n^2) by definition — the catalogued scale path is "
    "sim_cosine_pairs_lsh / sim_ann_lsh)",
    f"""
    WITH n AS (
        SELECT vec_id, embedding, {_NORM_SQL.format(v='embedding')} AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_reduce(list_transform(generate_series(1, len(a.embedding)),
                i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
                (x, y) -> x + y) / (a.nrm * b.nrm) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_reduce(list_transform(generate_series(1, len(a.embedding)),
                i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
                (x, y) -> x + y) / (a.nrm * b.nrm) >= 0.4
    """,
)
def sim_cosine_pairs(spark, sf_dir):
    return dedup.embedding_cosine_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)




# LSH bucket code in SQL: mirror similarity.lsh_bucket exactly — per
# plane, an order-pinned left fold of vec[i] * (+-1 from md5 nibble
# parity of 'p{plane}_{i}'), then a sign bit. Generated programmatically
# (6 planes), like the Spark side.
def _plane_fold_sql(p: int, vec: str) -> str:
    sign = (
        f"CASE WHEN CAST('0x' || substr(md5('p{p}_' || CAST(i - 1 AS VARCHAR)), 1, 1) "
        "AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END"
    )
    return (
        f"list_reduce(list_transform(generate_series(1, len({vec})), "
        f"i -> CAST({vec}[i] AS DOUBLE) * {sign}), (a, b) -> a + b)"
    )


def _bucket_sql(vec: str, n_planes: int = 6) -> str:
    bits = " + ".join(
        f"(CASE WHEN {_plane_fold_sql(p, vec)} >= 0 THEN {2**p} ELSE 0 END)"
        for p in range(n_planes)
    )
    return f"CAST({bits} AS INTEGER)"


@_q(
    "sim_cosine_pairs_lsh",
    "dedup/similarity: LSH-bucketed cosine pairs (the crossJoin-free "
    "scale path; only co-bucketed pairs scored)",
    f"""
    WITH n AS (
        SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket,
               {_NORM_SQL.format(v='embedding')} AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_reduce(list_transform(generate_series(1, len(a.embedding)),
                i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
                (x, y) -> x + y) / (a.nrm * b.nrm) AS cosine
    FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_reduce(list_transform(generate_series(1, len(a.embedding)),
                i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
                (x, y) -> x + y) / (a.nrm * b.nrm) >= 0.4
    """,
)
def sim_cosine_pairs_lsh(spark, sf_dir):
    return similarity.cosine_pairs_lsh(
        _t(spark, sf_dir, "embeddings"), threshold=0.4, n_planes=6
    )


@_q(
    "sim_ann_lsh",
    "similarity: LSH-bucketed approximate top-k (the scale path)",
    f"""
    WITH corpus AS (
        SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket,
               {_NORM_SQL.format(v='embedding')} AS nrm
        FROM embeddings
    ),
    q AS (
        SELECT vec_id AS query_id, embedding AS qvec, bucket, nrm AS norm_q
        FROM corpus WHERE vec_id < 3
    ),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_reduce(list_transform(generate_series(1, len(e.embedding)),
                    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)),
                    (a, b) -> a + b) / (e.nrm * q.norm_q) AS cosine
        FROM corpus e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= 5
    """,
)
def sim_ann_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    # n_tables=1: the single-table configuration the SQL oracle
    # transcribes exactly; the multi-table recall knob is covered by
    # tests/test_ann_recall.py against the exact baseline
    return similarity.ann_lsh_topk(emb, queries, k=5, n_tables=1)


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------

@_q(
    "multimodal_features",
    "multimodal: binary payload column -> Arrow-batched feature extraction",
    """
    SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           -- first UTF-8 BYTE of the encoded blob (not ascii() on the
           -- decoded string, which returns the code point and diverges
           -- from the Spark stub's b[0] for non-ASCII first chars)
           CAST(CASE WHEN length(text) = 0 THEN -1
                     ELSE CAST('0x' || substr(hex(encode(text)), 1, 2) AS INTEGER)
                END AS INTEGER) AS first_byte,
           'text/plain' AS media_type
    FROM documents
    """,
)
def multimodal_features(spark, sf_dir):
    media = multimodal.to_binary_table(_t(spark, sf_dir, "documents"))
    return multimodal.extract_features(media)


# ---------------------------------------------------------------------------
# Deterministic sampling (training-data curation)
# ---------------------------------------------------------------------------

from ..operators import sampling  # noqa: E402

_H60 = ("CAST('0x' || substr(md5('{seed}|' || CAST({key} AS VARCHAR)), 1, 15) "
        "AS BIGINT)")


@_q(
    "sample_hash",
    "sampling: deterministic 10% Bernoulli by content hash (partition-"
    "independent, reproducible, nested across fractions)",
    f"""
    SELECT doc_id, lang, text
    FROM documents
    WHERE {_H60.format(seed='s0', key='doc_id')} < {sampling.sample_bound(0.1)}
    """,
)
def sample_hash(spark, sf_dir):
    doc = _t(spark, sf_dir, "documents")
    return sampling.hash_sample(doc.select("doc_id", "lang", "text"), 0.1)


@_q(
    "sample_stratified_n",
    "sampling: exactly-n-per-stratum deterministic reservoir (hash-rank "
    "inside each stratum)",
    f"""
    WITH ranked AS (
        SELECT event_id, event_type,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY {_H60.format(seed='s0', key='event_id')}, event_id
               ) AS rn
        FROM events
    )
    SELECT event_id, event_type FROM ranked WHERE rn <= 50
    """,
)
def sample_stratified_n(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return sampling.stratified_sample_n(
        ev.select("event_id", "event_type"), 50, "event_type", "event_id"
    )


@_q(
    "text_tfidf_topk",
    "text: top-k TF-IDF terms per document (tf * ln(N/df), tie-broken "
    "on term for a unique top-k)",
    f"""
    WITH toks AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    terms AS (SELECT doc_id, unnest(tok) AS term FROM toks),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
    docfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM toks),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, docfreq.df,
               tf.tf * ln(CAST(n.n_docs AS DOUBLE) / docfreq.df) AS tfidf
        FROM tf JOIN docfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term) AS rn
        FROM scored
    )
    SELECT doc_id, term, tf, df, tfidf, rn FROM ranked WHERE rn <= 3
    """,
)
def text_tfidf_topk(spark, sf_dir):
    return text.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


def _dot_sql(a: str, b: str) -> str:
    return (f"list_reduce(list_transform(generate_series(1, len({a})), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)")


@_q(
    "sim_ann_ivf",
    "similarity: IVF-flat approximate top-k (deterministic hash-sampled "
    "centers, argmin cell assignment, n_probe=2 probe join)",
    f"""
    WITH centers AS (
        SELECT vec_id AS center_id, embedding AS cvec,
               {_NORM_SQL.format(v='embedding')} AS c_nrm
        FROM embeddings
        WHERE {_H60.format(seed='ivf', key='vec_id')} < {{bound}}
    ),
    corpus AS (
        SELECT vec_id, embedding, {_NORM_SQL.format(v='embedding')} AS nrm
        FROM embeddings
    ),
    ca AS (
        SELECT c.vec_id, c.embedding, c.nrm, ct.center_id,
               {_dot_sql('c.embedding', 'ct.cvec')} / (c.nrm * ct.c_nrm) AS c_cos
        FROM corpus c CROSS JOIN centers ct
    ),
    assigned AS (
        SELECT vec_id, embedding, nrm, center_id FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY c_cos DESC, center_id) AS crn
            FROM ca) WHERE crn = 1
    ),
    q AS (
        SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
        FROM corpus WHERE vec_id < 3
    ),
    qa AS (
        SELECT q.query_id, q.qvec, q.qnrm, ct.center_id,
               {_dot_sql('q.qvec', 'ct.cvec')} / (q.qnrm * ct.c_nrm) AS c_cos
        FROM q CROSS JOIN centers ct
    ),
    probes AS (
        SELECT query_id, qvec, qnrm, center_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY c_cos DESC, center_id) AS crn
            FROM qa) WHERE crn <= 2
    ),
    cand AS (
        SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
               a.embedding, a.nrm, p.qvec, p.qnrm
        FROM assigned a JOIN probes p
             ON a.center_id = p.center_id AND a.vec_id <> p.query_id
    ),
    scored AS (
        SELECT query_id, neighbor_id,
               {_dot_sql('embedding', 'qvec')} / (nrm * qnrm) AS cosine
        FROM cand
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= 5
    """.replace("{bound}", str(sampling.sample_bound(0.02))),
)
def sim_ann_ivf(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.ann_ivf_topk(emb, queries, k=5, center_fraction=0.02, n_probe=2)


@_q(
    "text_repetition",
    "within-doc repetition ratio (1 - distinct/total word trigrams) — "
    "the boilerplate/keyword-stuffing curation signal",
    f"""
    WITH toks AS (SELECT doc_id, {_TOK} AS tok FROM documents)
    SELECT doc_id,
           CASE WHEN len(tok) >= 3 THEN len(tok) - 2 ELSE 0 END AS n_ngrams,
           CASE WHEN len(tok) >= 3 THEN len(list_distinct(list_transform(
                    generate_series(0, len(tok) - 3),
                    i -> concat_ws(' ', tok[i+1], tok[i+2], tok[i+3]))))
                ELSE 0 END AS n_distinct,
           CASE WHEN len(tok) >= 3 THEN
                1.0 - CAST(len(list_distinct(list_transform(
                          generate_series(0, len(tok) - 3),
                          i -> concat_ws(' ', tok[i+1], tok[i+2], tok[i+3]))))
                      AS DOUBLE) / CAST(len(tok) - 2 AS DOUBLE)
                ELSE 0.0 END AS repetition
    FROM toks
    """,
)
def text_repetition(spark, sf_dir):
    return text.repetition_ratio(_t(spark, sf_dir, "documents"))


_SCAN_PATTERNS = {
    # PII-style + quality patterns, restricted to the regex subset Java
    # and RE2-class engines count identically (no backrefs/lookaround)
    "n_email": "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "n_digit_runs": "[0-9]{4,}",
    "n_vowel_runs": "[aeiou]{2,}",
}


@_q(
    "text_regex_scan",
    "regex scanning surface: per-doc non-overlapping match counts for "
    "named PII/quality patterns (emails, digit runs, character-class "
    "runs)",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_SCAN_PATTERNS["n_email"]}')) AS BIGINT)
               AS n_email,
           CAST(len(regexp_extract_all(text, '{_SCAN_PATTERNS["n_digit_runs"]}')) AS BIGINT)
               AS n_digit_runs,
           CAST(len(regexp_extract_all(text, '{_SCAN_PATTERNS["n_vowel_runs"]}')) AS BIGINT)
               AS n_vowel_runs
    FROM documents
    """,
)
def text_regex_scan(spark, sf_dir):
    return text.regex_scan(_t(spark, sf_dir, "documents"), _SCAN_PATTERNS)


@_q(
    "embedding_centroids",
    "per-group embedding centroid reduced to scalars (count, dim, "
    "centroid L2 norm) — distributed elementwise mean via posexplode + "
    "one (group, pos) partial-agg shuffle; decimal accumulation keeps "
    "the norm bit-identical across engines",
    """
    WITH dims AS (SELECT max(len(embedding)) AS d FROM embeddings),
    positions AS (
        SELECT unnest(generate_series(1, (SELECT d FROM dims))) AS i
    ),
    comp AS (
        SELECT label, i,
               CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(27,9)))
                    AS DOUBLE) / count(*) AS mean_v
        FROM embeddings CROSS JOIN positions
        GROUP BY label, i
    ),
    norms AS (
        SELECT label,
               sqrt(CAST(sum(CAST(mean_v * mean_v AS DECIMAL(38,18))) AS DOUBLE))
                   AS centroid_norm
        FROM comp GROUP BY label
    )
    SELECT e.label, count(*) AS n_vecs, max(len(e.embedding)) AS dim,
           max(n.centroid_norm) AS centroid_norm
    FROM embeddings e JOIN norms n ON e.label = n.label
    GROUP BY e.label
    """,
)
def embedding_centroids(spark, sf_dir):
    return similarity.centroid_norms(_t(spark, sf_dir, "embeddings"))


_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_MIX_DEFAULT = 0.05


def _mix_case_sql() -> str:
    arms = " ".join(
        f"WHEN '{s}' THEN {sampling.sample_bound(r)}"
        for s, r in _MIX_RATES.items()
    )
    return (
        f"CASE source {arms} ELSE {sampling.sample_bound(_MIX_DEFAULT)} END"
    )


@_q(
    "corpus_mix",
    "weighted corpus mixing: per-source deterministic Bernoulli rates "
    "(integer hash thresholds baked driver-side; nested across rates — "
    "raising a weight only ADDS rows)",
    f"""
    SELECT doc_id, source
    FROM documents
    WHERE {_H60.format(seed='mix0', key='doc_id')} < {_mix_case_sql()}
    """,
)
def corpus_mix(spark, sf_dir):
    doc = _t(spark, sf_dir, "documents")
    return sampling.weighted_mix(
        doc.select("doc_id", "source"), _MIX_RATES, default_rate=_MIX_DEFAULT
    )


@_q(
    "pack_sequences",
    "sequence packing (contiguous-fill): per-shard running token sums "
    "give every doc its start offset, bin id and straddle spill in the "
    "packed stream — deterministic integer layout at any parallelism",
    f"""
    WITH toks AS (
        SELECT doc_id, lang, CAST(len({_TOK}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, lang, n_tokens,
               CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING) - n_tokens
                    AS BIGINT) AS start_offset
        FROM toks
    )
    SELECT doc_id, lang, n_tokens, start_offset,
           start_offset // 512 AS bin_id,
           CAST(greatest(0, (start_offset % 512) + n_tokens - 512) AS BIGINT)
               AS bin_spill
    FROM cum
    """,
)
def pack_sequences(spark, sf_dir):
    from ..operators import packing

    doc = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.size(text.tokens("text")).cast("long").alias("n_tokens"),
    )
    return packing.pack_offsets(doc, cap=512)


@_q(
    "text_decontaminate",
    "benchmark decontamination: distinct word-trigram overlap between "
    "each corpus doc and a broadcast eval set (doc_id % 97 == 0); "
    "contaminated when >= 2 shared trigrams",
    f"""
    WITH toks AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    sh AS (
        SELECT doc_id, unnest(list_distinct(CASE WHEN len(tok) >= 3 THEN
                   list_transform(generate_series(0, len(tok) - 3),
                       i -> concat_ws(' ', tok[i+1], tok[i+2], tok[i+3]))
               ELSE [] END)) AS shingle
        FROM toks
    ),
    ev AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id % 97 = 0),
    corp AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0),
    hits AS (
        SELECT c.doc_id,
               count(DISTINCT c.shingle) AS n_shared_ngrams,
               count(DISTINCT e.eval_id) AS n_eval_docs
        FROM corp c JOIN ev e USING (shingle)
        GROUP BY c.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(h.n_shared_ngrams, 0) AS BIGINT) AS n_shared_ngrams,
           CAST(coalesce(h.n_eval_docs, 0) AS BIGINT) AS n_eval_docs,
           coalesce(h.n_shared_ngrams, 0) >= 2 AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 97 <> 0
    """,
)
def text_decontaminate(spark, sf_dir):
    from ..operators import decontam

    doc = _t(spark, sf_dir, "documents")
    eval_set = doc.where(F.col("doc_id") % 97 == 0)
    corpus = doc.where(F.col("doc_id") % 97 != 0)
    return decontam.eval_ngram_overlap(corpus, eval_set, n=3, min_overlap=2)


@_q(
    "dedup_semantic",
    "SemDeDup-style semantic dedup: IVF cell assignment (broadcast "
    "hash-sampled centers), then keep-lowest-id within each cluster at "
    "cosine >= 0.4",
    f"""
    WITH centers AS (
        SELECT vec_id AS center_id, embedding AS cvec,
               {_NORM_SQL.format(v='embedding')} AS c_nrm
        FROM embeddings
        WHERE {_H60.format(seed='ivf', key='vec_id')} < {{bound}}
    ),
    corpus AS (
        SELECT vec_id, embedding, {_NORM_SQL.format(v='embedding')} AS nrm
        FROM embeddings
    ),
    ca AS (
        SELECT c.vec_id, c.embedding, c.nrm, ct.center_id,
               {_dot_sql('c.embedding', 'ct.cvec')} / (c.nrm * ct.c_nrm) AS c_cos
        FROM corpus c CROSS JOIN centers ct
    ),
    assigned AS (
        SELECT vec_id, embedding, nrm, center_id FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY c_cos DESC, center_id) AS crn
            FROM ca) WHERE crn = 1
    ),
    prev AS (
        SELECT a.vec_id,
               max({_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm))
                   AS max_prev_cos
        FROM assigned a JOIN assigned b
             ON a.center_id = b.center_id AND b.vec_id < a.vec_id
        GROUP BY a.vec_id
    )
    SELECT a.vec_id, a.center_id,
           coalesce(p.max_prev_cos, -2.0) AS max_prev_cos,
           coalesce(p.max_prev_cos >= 0.4, FALSE) AS is_dup
    FROM assigned a LEFT JOIN prev p ON a.vec_id = p.vec_id
    """.replace("{bound}", str(sampling.sample_bound(0.02))),
)
def dedup_semantic(spark, sf_dir):
    out = similarity.semantic_dedup(
        _t(spark, sf_dir, "embeddings"), threshold=0.4, center_fraction=0.02
    )
    # cluster-first docs have no prior neighbor: null cosine -> -2.0
    # sentinel (outside [-1,1]) so the frame carries no null doubles
    return out.withColumn(
        "max_prev_cos", F.coalesce(F.col("max_prev_cos"), F.lit(-2.0))
    )


@_q(
    "multimodal_image",
    "multimodal: REAL Netpbm P6 codec — deterministic synthetic PPM "
    "payloads decoded by the stdlib parser; the oracle recomputes the "
    "decoded features from the pinned pixel recurrence "
    "(byte k of doc d = (d*7 + k*11) % 256)",
    """
    WITH dims AS (
        SELECT doc_id, 1 + doc_id % 4 AS w, 1 + doc_id % 3 AS h
        FROM documents
    ),
    px AS (
        SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS j
        FROM dims
    ),
    chan AS (
        SELECT doc_id,
               avg(CAST((doc_id * 7 + (3 * j + 0) * 11) % 256 AS DOUBLE)) AS mean_r,
               avg(CAST((doc_id * 7 + (3 * j + 1) * 11) % 256 AS DOUBLE)) AS mean_g,
               avg(CAST((doc_id * 7 + (3 * j + 2) * 11) % 256 AS DOUBLE)) AS mean_b
        FROM px GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
           CAST(d.w * d.h AS BIGINT) AS n_pixels,
           c.mean_r, c.mean_g, c.mean_b,
           0.299 * c.mean_r + 0.587 * c.mean_g + 0.114 * c.mean_b AS luma
    FROM dims d JOIN chan c USING (doc_id)
    """,
)
def multimodal_image(spark, sf_dir):
    media = multimodal.synth_ppm_table(_t(spark, sf_dir, "documents"))
    return multimodal.image_features(media)


@_q(
    "text_tokens_bpe",
    "BPE-ish regex pre-tokenizer (GPT-2 shape, lookaround-free subset): "
    "subword token counts + tokens-per-word cost proxy",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
               '{text.BPE_PATTERN.replace("'", "''")}')) AS BIGINT)
               AS n_bpe_tokens,
           CAST(len({_TOK}) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text,
               '{text.BPE_PATTERN.replace("'", "''")}')) AS DOUBLE)
               / greatest(len({_TOK}), 1) AS bpe_per_word
    FROM documents
    """,
)
def text_tokens_bpe(spark, sf_dir):
    return text.bpe_token_stats(_t(spark, sf_dir, "documents"))


@_q(
    "text_winnow",
    "winnowing fingerprints (MOSS, SIGMOD'03): md5-hashed char 5-grams, "
    "4-window minima, distinct set — guarantees any shared run of >= 8 "
    "chars shares a fingerprint",
    """
    WITH norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nm
        FROM documents
    ),
    grams AS (
        SELECT doc_id, CASE WHEN length(nm) >= 5 THEN
                   list_transform(generate_series(0, length(nm) - 5),
                                  i -> substr(nm, i + 1, 5))
               ELSE [] END AS g
        FROM norm
    ),
    hashed AS (
        SELECT doc_id, list_transform(g, t ->
                   CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) & 4294967295) AS h
        FROM grams
    ),
    mins AS (
        SELECT doc_id, CASE WHEN len(h) >= 4 THEN
                   list_transform(generate_series(0, len(h) - 4),
                                  j -> list_min(h[j+1:j+4]))
               ELSE [] END AS m
        FROM hashed
    )
    SELECT doc_id, unnest(list_distinct(m)) AS fp FROM mins
    """,
)
def text_winnow(spark, sf_dir):
    return text.winnow_fingerprints(_t(spark, sf_dir, "documents"), k=5, w=4)


@_q(
    "embedding_quantize",
    "per-vector int8 scalar quantization (FAISS SQ8 shape): pinned "
    "floor(x+0.5) rounding, order-pinned reconstruction-error fold — "
    "zero shuffle at any corpus size",
    """
    WITH base AS (
        SELECT vec_id, embedding,
               CAST(list_min(embedding) AS DOUBLE) AS lo,
               CAST(list_max(embedding) AS DOUBLE) AS hi
        FROM embeddings
    ),
    coded AS (
        SELECT vec_id, embedding, lo, hi,
               CASE WHEN hi > lo THEN (hi - lo) / 255.0 ELSE 0.0 END AS scale,
               CASE WHEN hi > lo THEN
                   list_transform(embedding, x -> least(127, greatest(-128,
                       CAST(floor((CAST(x AS DOUBLE) - lo) / ((hi - lo) / 255.0)
                            + 0.5) AS INT) - 128)))
               ELSE list_transform(embedding, x -> 0) END AS c
        FROM base
    )
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           lo AS vmin, hi AS vmax,
           CAST(len(c) AS BIGINT) AS n_codes,
           list_reduce(list_transform(generate_series(1, len(embedding)),
               i -> abs(CAST(embedding[i] AS DOUBLE)
                        - ((c[i] + 128) * scale + lo))),
               (a, b) -> a + b) / len(embedding) AS mean_abs_err
    FROM coded
    """,
)
def embedding_quantize(spark, sf_dir):
    return similarity.quantize_embeddings(_t(spark, sf_dir, "embeddings"))


def _sqdist_sql(e: str, c: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({e})), "
        f"i -> (CAST({e}[i] AS DOUBLE) - {c}[i]) "
        f"* (CAST({e}[i] AS DOUBLE) - {c}[i])), (x, y) -> x + y)"
    )


@_q(
    "kmeans_iter2",
    "distributed k-means, 2 Lloyd rounds (iterative algorithm with an "
    "EXACT oracle: seed-pinned hash-sampled init, order-pinned distance "
    "folds, decimal-exact component means, ties to smaller center_id)",
    f"""
    WITH centers0 AS (
        SELECT vec_id AS center_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
        FROM embeddings
        WHERE {_H60.format(seed='ivf', key='vec_id')} < {{bound}}
    ),
    d1 AS (
        SELECT e.vec_id, e.embedding, c.center_id,
               {_sqdist_sql('e.embedding', 'c.cvec')} AS dist
        FROM embeddings e CROSS JOIN centers0 c
    ),
    a1 AS (
        SELECT vec_id, embedding, center_id FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY dist, center_id) AS rn
            FROM d1) WHERE rn = 1
    ),
    pos AS (
        SELECT unnest(generate_series(1,
            (SELECT max(len(embedding)) FROM embeddings))) AS i
    ),
    m1 AS (
        SELECT center_id, i,
               CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(27,9)))
                    AS DOUBLE) / count(*) AS mean_v
        FROM a1 CROSS JOIN pos
        GROUP BY center_id, i
    ),
    c1 AS (
        SELECT c0.center_id, coalesce(m.cv, c0.cvec) AS cvec
        FROM centers0 c0 LEFT JOIN (
            SELECT center_id, list(mean_v ORDER BY i) AS cv
            FROM m1 GROUP BY center_id
        ) m USING (center_id)
    ),
    d2 AS (
        SELECT e.vec_id, e.embedding, c.center_id,
               {_sqdist_sql('e.embedding', 'c.cvec')} AS dist
        FROM embeddings e CROSS JOIN c1 c
    ),
    a2 AS (
        SELECT vec_id, embedding, center_id FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY dist, center_id) AS rn
            FROM d2) WHERE rn = 1
    ),
    m2 AS (
        SELECT center_id, i,
               CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(27,9)))
                    AS DOUBLE) / count(*) AS mean_v
        FROM a2 CROSS JOIN pos
        GROUP BY center_id, i
    ),
    c2 AS (
        SELECT c1.center_id, coalesce(m.cv, c1.cvec) AS cvec
        FROM c1 LEFT JOIN (
            SELECT center_id, list(mean_v ORDER BY i) AS cv
            FROM m2 GROUP BY center_id
        ) m USING (center_id)
    ),
    d3 AS (
        SELECT e.vec_id, c.center_id,
               {_sqdist_sql('e.embedding', 'c.cvec')} AS dist
        FROM embeddings e CROSS JOIN c2 c
    )
    SELECT vec_id, center_id, dist FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, center_id) AS rn
        FROM d3) WHERE rn = 1
    """.replace("{bound}", str(sampling.sample_bound(0.02))),
)
def kmeans_iter2(spark, sf_dir):
    from ..operators import clustering

    return clustering.kmeans_assign(
        _t(spark, sf_dir, "embeddings"), n_iter=2, center_fraction=0.02
    )


def _pagerank_sql(n_iter: int = 3, damping: float = 0.85) -> str:
    """Unroll the power iteration as chained CTEs (mechanical mirror of
    operators.graph.pagerank over the user -> event_type bipartite
    projection of events)."""
    ctes = [
        "edges AS (SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS src, "
        "'t' || event_type AS dst FROM events)",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        "r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        prev = f"r{i - 1}"
        ctes.append(
            f"c{i} AS (SELECT e.dst, CAST(sum(CAST(r.rank / d.deg AS "
            f"DECIMAL(38,18))) AS DOUBLE) AS inflow "
            f"FROM edges e JOIN {prev} r ON e.src = r.node "
            f"JOIN deg d ON d.src = r.node GROUP BY e.dst)"
        )
        ctes.append(
            f"d{i} AS (SELECT CAST(coalesce(sum(CAST(r.rank AS "
            f"DECIMAL(38,18))), 0) AS DOUBLE) AS dm "
            f"FROM {prev} r LEFT JOIN deg d ON r.node = d.src "
            f"WHERE d.src IS NULL)"
        )
        ctes.append(
            f"r{i} AS (SELECT n.node, (1.0 - {damping}) / (SELECT n FROM nn) "
            f"+ {damping} * (coalesce(c.inflow, 0.0) "
            f"+ (SELECT dm FROM d{i}) / (SELECT n FROM nn)) AS rank "
            f"FROM nodes n LEFT JOIN c{i} c ON n.node = c.dst)"
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT node, rank FROM r{n_iter}"
    )


@_q(
    "graph_pagerank",
    "PageRank, 3 power iterations over the user -> event_type bipartite "
    "graph (decimal-exact message accumulation, uniform dangling-mass "
    "redistribution — iterative graph analytics with an exact oracle)",
    _pagerank_sql(3, 0.85),
)
def graph_pagerank(spark, sf_dir):
    from ..operators import graph

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t"), F.col("event_type")).alias("dst"),
    )
    return graph.pagerank(edges, n_iter=3, damping=0.85)


# ---------------------------------------------------------------------------
# Round 6: containment dedup, weighted sampling, blocked fuzzy matching
# ---------------------------------------------------------------------------

from ..operators import linkage  # noqa: E402


@_q(
    "dedup_containment",
    "dedup: shingle-containment pairs |A∩B|/min(|A|,|B|) — catches the "
    "truncation/excerpt duplicates Jaccard structurally misses (Broder's "
    "containment measure; CCNet/Gopher curation complement)",
    f"""
    WITH {_NGRAM_JACCARD_CTES}
    SELECT i.id_a, i.id_b, i.n_inter,
           CAST(i.n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh) AS containment
    FROM inter i
    JOIN sized sa ON sa.doc_id = i.id_a
    JOIN sized sb ON sb.doc_id = i.id_b
    WHERE CAST(i.n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh) >= 0.5
    """,
)
def dedup_containment(spark, sf_dir):
    return dedup.containment_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5
    )


_TWO60 = float(1 << sampling.HASH_BITS)
_ES_KEY = (
    "pow((CAST('0x' || substr(md5('w0|' || CAST(doc_id AS VARCHAR)), 1, 15) "
    f"AS BIGINT) + 0.5) / {_TWO60!r}, 1.0 / n_chars)"
)


@_q(
    "sample_weighted",
    "sampling: deterministic weighted sample without replacement "
    "(Efraimidis–Vitter A-Res over content-hash uniforms — "
    "length-proportional corpus draws, engine-reproducible)",
    f"""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE n_chars > 0
    ORDER BY {_ES_KEY} DESC, doc_id
    LIMIT 300
    """,
)
def sample_weighted(spark, sf_dir):
    doc = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return sampling.weighted_sample(doc, 300, "n_chars", "doc_id", seed="w0")


@_q(
    "fuzzy_match_pairs",
    "entity resolution: blocked Levenshtein pairs — equi-join blocking "
    "keeps the edit-distance predicate O(block²), never O(n²); "
    "F.levenshtein is JVM codegen and exists verbatim in DuckDB",
    """
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           levenshtein(a.p_name, b.p_name) AS distance
    FROM part a JOIN part b USING (p_brand)
    WHERE a.p_partkey < b.p_partkey
      AND levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fuzzy_match_pairs(spark, sf_dir):
    return linkage.fuzzy_match_pairs(
        _t(spark, sf_dir, "part"), "p_partkey", "p_name",
        ["p_brand"], max_distance=2,
    )


_CLUSTERS_CTES = f"""{_MH_PAIRS_CTES},
    edges AS (
        SELECT id_a AS s, id_b AS d FROM mh_pairs
        UNION
        SELECT id_b, id_a FROM mh_pairs
    ),
    reach(node, label) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.node
    ),
    clusters AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node)"""


@_q(
    "dedup_keep_canonical",
    "dedup: final survivor selection — one canonical doc per near-dup "
    "cluster (min-id), unpaired docs pass through; the step the pair/"
    "cluster operators exist for",
    f"""
    WITH RECURSIVE {_CLUSTERS_CTES}
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d LEFT JOIN clusters c ON c.node = d.doc_id
    WHERE c.node IS NULL OR c.cluster_id = d.doc_id
    """,
)
def dedup_keep_canonical(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs)
    return dedup.keep_canonical(
        docs.select("doc_id", "lang", "n_chars"), pairs
    )


@_q(
    "split_leakage_safe",
    "curation: leakage-safe train/val/test split — every member of a "
    "near-dup cluster hashes by its CLUSTER id, so paraphrase pairs "
    "can never straddle train and eval (the within-corpus sibling of "
    "text_decontaminate)",
    f"""
    WITH RECURSIVE {_CLUSTERS_CTES}
    SELECT d.doc_id,
           CASE WHEN {_H60.format(seed='split0',
                                  key='coalesce(c.cluster_id, d.doc_id)')}
                     < {sampling.sample_bound(0.8)} THEN 'train'
                WHEN {_H60.format(seed='split0',
                                  key='coalesce(c.cluster_id, d.doc_id)')}
                     < {sampling.sample_bound(0.9)} THEN 'val'
                ELSE 'test' END AS split
    FROM documents d LEFT JOIN clusters c ON c.node = d.doc_id
    """,
)
def split_leakage_safe(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs)
    return sampling.leakage_safe_split(docs.select("doc_id"), pairs)


# ---------------------------------------------------------------------------
# Round 6 (cont.): char entropy, PII redaction, BM25 relevance
# ---------------------------------------------------------------------------

@_q(
    "text_char_entropy",
    "text: character-level Shannon entropy (gibberish/boilerplate "
    "signal, Gopher/C4-lineage quality heuristic) — scan-local "
    "higher-order fold, order pinned to the sorted alphabet",
    r"""
    WITH base AS (
        SELECT doc_id,
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        FROM documents
    ),
    withc AS (
        SELECT doc_id,
               list_transform(range(0, length(norm)),
                              i -> substr(norm, CAST(i + 1 AS BIGINT), 1)) AS ch
        FROM base
    ),
    alpha AS (
        SELECT doc_id, ch, list_sort(list_distinct(ch)) AS alpha FROM withc
    )
    SELECT doc_id,
           len(ch) AS n_chars_norm,
           len(alpha) AS n_distinct_chars,
           CASE WHEN len(ch) > 0 THEN list_sum(list_transform(alpha, c ->
               -(CAST(len(list_filter(ch, x -> x = c)) AS DOUBLE)
                 / CAST(len(ch) AS DOUBLE))
               * log2(CAST(len(list_filter(ch, x -> x = c)) AS DOUBLE)
                      / CAST(len(ch) AS DOUBLE))))
           ELSE 0.0 END AS char_entropy
    FROM alpha
    """,
)
def text_char_entropy(spark, sf_dir):
    return text.char_entropy(_t(spark, sf_dir, "documents"))


_PII_COUNT_AND_REDACT_SQL = """
    SELECT doc_id,
           len(regexp_extract_all(text, '{email}')) AS n_email,
           len(regexp_extract_all(regexp_replace(text, '{email}', '<EMAIL>', 'g'),
                                  '{ipv4}')) AS n_ipv4,
           len(regexp_extract_all(
                   regexp_replace(regexp_replace(text, '{email}', '<EMAIL>', 'g'),
                                  '{ipv4}', '<IP>', 'g'),
                   '{phone}')) AS n_phone,
           regexp_replace(
               regexp_replace(regexp_replace(text, '{email}', '<EMAIL>', 'g'),
                              '{ipv4}', '<IP>', 'g'),
               '{phone}', '<PHONE>', 'g') AS redacted
    FROM documents
"""


@_q(
    "text_pii_redact",
    "text: PII scrubbing — typed placeholder redaction of email/IPv4/"
    "phone spans with per-class counts (the rewrite sibling of "
    "text_regex_scan); order-pinned sequential replacement",
    _PII_COUNT_AND_REDACT_SQL.format(
        email="[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+",
        ipv4="[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
        phone="\\+?[0-9][0-9()., -]{7,}[0-9]",
    ),
)
def text_pii_redact(spark, sf_dir):
    return text.pii_redact(_t(spark, sf_dir, "documents"))


_BM25_TERMS = ["spark", "vector", "merge"]
_BM25_TF = ",\n           ".join(
    f"len(list_filter(tok, t -> t = '{q}')) AS tf_{i}"
    for i, q in enumerate(_BM25_TERMS)
)
_BM25_DF = ",\n           ".join(
    f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
    for i in range(len(_BM25_TERMS))
)
_BM25_SCORE = " + ".join(
    f"""(ln((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)
             / (CAST(df_{i} AS DOUBLE) + 0.5) + 1.0)
         * (CAST(tf_{i} AS DOUBLE) * 2.2
            / (CAST(tf_{i} AS DOUBLE)
               + 1.2 * (1.0 - 0.75 + 0.75 * dl / avg_dl))))"""
    for i in range(len(_BM25_TERMS))
)


@_q(
    "bm25_topk",
    "text: Okapi BM25 top-k relevance against a pinned query set — "
    "scan-local per-term tf, ONE broadcast stats aggregate, "
    "TakeOrderedAndProject top-k (never a full sort)",
    f"""
    WITH base AS (SELECT doc_id, {_TOK} AS tok FROM documents),
    scored0 AS (
        SELECT doc_id, len(tok) AS dl,
           {_BM25_TF}
        FROM base
    ),
    stats AS (
        SELECT count(*) AS n_docs, avg(dl) AS avg_dl,
           {_BM25_DF}
        FROM scored0
    )
    SELECT doc_id, dl, {_BM25_SCORE} AS bm25
    FROM scored0, stats
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def bm25_topk(spark, sf_dir):
    return text.bm25_topk(
        _t(spark, sf_dir, "documents"), _BM25_TERMS, k=20, k1=1.2, b=0.75
    )
