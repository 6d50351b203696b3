"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language-ID
heuristic, quality scoring, token statistics, document fingerprinting.
Everything is built-in-function Column algebra (whole-stage codegen,
no Python in the hot path) so a 100 TB documents table runs scan-local
with zero shuffles for the per-document features.

Determinism contract: token order, regex classes, and tie-breaks are
pinned so the DuckDB oracle can mirror every expression exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny pinned stopword lists (public, common function words). Enough for
# a coarse n-gram/stopword-hit heuristic; NOT a real langid model.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "a"],
    "de": ["der", "die", "das", "und", "ist", "mit", "ein", "nicht", "von", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "una"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "dans", "pour", "que"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "人"],
}
LANG_ORDER = ["en", "de", "es", "fr", "zh"]  # fixed tie-break order


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization, lowercased, empty tokens dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != "")


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token counts + mean token length (BPE-ish proxy).

    The token array binds to a column first: re-inlining the tokenizer
    expression per use would re-run split+filter several times per row.
    """
    base = df.select(F.col(id_col), tokens(text_col).alias("_tok"))
    n = F.size("_tok")
    total_len = F.aggregate(F.col("_tok"), F.lit(0), lambda acc, t: acc + F.length(t))
    return base.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.size(F.array_distinct("_tok")).alias("n_unique"),
        (total_len.cast("double") / n).alias("avg_token_len"),
    )


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality signals: length, punctuation/digit ratios,
    stopword ratio, type-token ratio."""
    txt = F.col(text_col)
    low = F.lower(txt)
    base = df.select(
        F.col(id_col),
        F.length(txt).alias("_n_chars"),
        F.length(F.regexp_replace(low, "[^a-z0-9 \t\n]", "")).alias("_n_alnum_ws"),
        (F.length(txt) - F.length(F.regexp_replace(low, "[0-9]", ""))).alias("_n_digits"),
        tokens(text_col).alias("_tok"),
    ).withColumn("_dtok", F.array_distinct("_tok"))
    n_chars = F.col("_n_chars")
    n_stop = F.size(F.array_intersect(F.col("_dtok"), F.lit(STOPWORDS["en"])))
    return base.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        F.size("_tok").alias("n_tokens"),
        ((n_chars - F.col("_n_alnum_ws")).cast("double") / n_chars).alias("punct_ratio"),
        (F.col("_n_digits").cast("double") / n_chars).alias("digit_ratio"),
        (n_stop.cast("double") / F.greatest(F.size("_dtok"), F.lit(1))).alias("stopword_ratio"),
        (F.size("_dtok").cast("double") / F.greatest(F.size("_tok"), F.lit(1))).alias(
            "type_token_ratio"
        ),
    )


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Stopword-hit score per language over distinct tokens."""
    distinct_toks = F.array_distinct(tokens(text_col))
    return {
        lang: F.size(F.array_intersect(distinct_toks, F.lit(words)))
        for lang, words in STOPWORDS.items()
    }


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pick the max-scoring language; ties resolve by LANG_ORDER.

    A real deployment would swap in fastText/CLD3 behind this same
    signature; the heuristic keeps the operator dependency-free and
    oracle-checkable.
    """
    base = df.select(
        F.col(id_col), F.array_distinct(tokens(text_col)).alias("_dtok")
    ).select(
        F.col(id_col),
        *[
            F.size(F.array_intersect(F.col("_dtok"), F.lit(words))).alias(f"score_{lang}")
            for lang, words in STOPWORDS.items()
        ],
    )
    scores = {lang: F.col(f"score_{lang}") for lang in LANG_ORDER}
    pick = None
    for lang in LANG_ORDER:
        cond = None
        for other in LANG_ORDER:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        pick = F.when(cond, lang) if pick is None else pick.when(cond, lang)
    return base.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_ORDER],
        pick.otherwise(LANG_ORDER[0]).alias("detected_lang"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical content fingerprint: md5 over whitespace-normalized
    lowercase text (exact-dedup key that survives formatting noise)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))


def tfidf_top_terms(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                    k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document (keyword extraction / relevance
    weighting for corpus curation).

    score = tf * ln(N / df): term frequency from an explode+groupBy
    (map-side combined), document frequency from a second groupBy over
    the distinct (doc, term) pairs, the corpus size N broadcast as a
    1-row aggregate. The per-term join shuffles on the term — the only
    data-sized shuffle; ln/div are IEEE-identical across engines so the
    DuckDB oracle matches bitwise. Ties (equal score) break on term
    order, making the top-k unique.
    """
    from pyspark.sql.window import Window

    base = df.select(F.col(id_col), tokens(text_col).alias("_tok"))
    terms = base.select(F.col(id_col), F.explode("_tok").alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = base.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(F.col(id_col), "term", "tf", "df", "tfidf", "rn")
    )


def repetition_ratio(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Within-document repetition: 1 - distinct/total word n-grams —
    the standard boilerplate/spam signal for pretraining curation
    (high ratio = the document repeats itself; loops, templates, SEO
    keyword stuffing). Pure higher-order functions, no shuffle."""
    base = df.select(F.col(id_col), tokens(text_col).alias("_tok"))
    has = F.size("_tok") >= n
    total = F.when(has, F.size("_tok") - (n - 1)).otherwise(0)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_tok") - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at("_tok", i + j + 1) for j in range(n)]
        ),
    )
    distinct = F.when(has, F.size(F.array_distinct(grams))).otherwise(0)
    return base.select(
        F.col(id_col),
        total.alias("n_ngrams"),
        distinct.alias("n_distinct"),
        F.when(
            total > 0,
            F.lit(1.0) - distinct.cast("double") / total.cast("double"),
        ).otherwise(0.0).alias("repetition"),
    )


# GPT-2-style pre-tokenizer, restricted to the regex subset Java and
# RE2-class engines match identically (no lookaround, explicit classes;
# both engines use leftmost-first alternation): contraction suffixes,
# space-prefixed letter runs, digit runs, symbol runs.
BPE_PATTERN = "'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"


def bpe_token_stats(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Subword-style token accounting: count tokens under the BPE-ish
    regex pre-tokenizer next to the whitespace tokenizer — the
    tokens-per-word ratio is the standard proxy for how expensive a
    document is to a subword vocabulary (high ratio = rare words,
    noise, non-Latin text). JVM-side regexp_extract_all, no UDFs."""
    # idx=0: the whole match (the pattern has no capture groups; Spark's
    # default idx is group 1)
    toks_re = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)
    base = df.select(
        F.col(id_col),
        F.size(toks_re).alias("n_bpe_tokens"),
        F.size(tokens(text_col)).alias("n_ws_tokens"),
    )
    return base.select(
        F.col(id_col),
        "n_bpe_tokens",
        "n_ws_tokens",
        (
            F.col("n_bpe_tokens").cast("double")
            / F.greatest(F.col("n_ws_tokens"), F.lit(1))
        ).alias("bpe_per_word"),
    )


def _char_hash32(t: Column) -> Column:
    """First 15 hex chars of md5 -> 60-bit int -> low 32 bits (the same
    engine-portable construction as the minhash token hash)."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint").bitwiseAND(
        F.lit(0xFFFFFFFF)
    )


def winnow_fingerprints(df: DataFrame, k: int = 5, w: int = 4,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every character k-gram of
    the whitespace-normalized text, slide a w-window over the hash
    sequence, keep each window's minimum; the distinct minima are the
    fingerprint set. Guarantees any shared run of >= k+w-1 characters
    between two documents shares at least one fingerprint — the
    plagiarism/near-dup detection primitive with a tunable
    density/guarantee trade (vs minhash's probabilistic similarity).

    All higher-order Column algebra inside the row (no shuffle until
    the caller groups/joins on fp); output one row per (doc,
    fingerprint). Documents shorter than k+w-1 chars emit no rows."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = df.select(F.col(id_col), norm.alias("_norm"))
    n = F.length("_norm")
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.col("_norm").substr(i + 1, F.lit(k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hashed = base.select(
        F.col(id_col), F.transform(grams, _char_hash32).alias("_h")
    )
    nh = F.size("_h")
    mins = F.when(
        nh >= w,
        F.transform(
            F.sequence(F.lit(0), nh - w),
            lambda j: F.array_min(F.slice(F.col("_h"), j + 1, w)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return hashed.select(
        F.col(id_col), F.explode(F.array_distinct(mins)).alias("fp")
    )


def regex_scan(df: DataFrame, patterns: dict[str, str],
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document non-overlapping match counts for named regex
    patterns — the PII/quality scanning surface (emails, phone-shaped
    digit runs, repeated character classes). One JVM-side regexp_count
    column per pattern; patterns should stick to the regex subset Java
    and RE2-class engines agree on (no backrefs/lookbehind) so oracle
    engines count identically."""
    cols = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(name)
        for name, pat in patterns.items()
    ]
    return df.select(F.col(id_col), *cols)


def char_entropy(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Character-level Shannon entropy per document — the classic
    gibberish/boilerplate signal (near-zero entropy = repeated filler,
    very high = random noise/base64 blobs; quality-filter heuristic in
    the Gopher/C4 lineage).

    Whitespace is normalized first so formatting doesn't move the
    score. The whole computation is scan-local higher-order Column
    algebra: chars -> sorted distinct alphabet -> order-pinned fold of
    -p*log2(p). Cost is O(|alphabet| * len) per row with no shuffle,
    the right trade at 100 TB vs an explode+groupBy that would shuffle
    one row per character. The fold order (sorted alphabet) is pinned
    so the DuckDB oracle sums in the identical sequence.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = df.select(F.col(id_col), norm.alias("_norm"))
    n = F.length("_norm")
    chars = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.col("_norm").substr(i + 1, F.lit(1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    withc = base.select(
        F.col(id_col), F.col("_norm"), chars.alias("_ch"),
        F.array_sort(F.array_distinct(chars)).alias("_alpha"),
    )
    total = F.size("_ch").cast("double")
    ent = F.aggregate(
        F.col("_alpha"),
        F.lit(0.0),
        lambda acc, c: acc
        - (F.size(F.filter(F.col("_ch"), lambda x: x == c)) / total)
        * F.log2(F.size(F.filter(F.col("_ch"), lambda x: x == c)) / total),
    )
    return withc.select(
        F.col(id_col),
        F.size("_ch").alias("n_chars_norm"),
        F.size("_alpha").alias("n_distinct_chars"),
        F.when(F.size("_ch") > 0, ent).otherwise(0.0).alias("char_entropy"),
    )


# PII surface patterns, restricted to the regex subset Java and
# RE2-class engines match identically (no backrefs/lookaround; explicit
# classes; greedy quantifiers agree under leftmost-longest-prefix for
# these shapes). Redaction order is part of the contract: emails first
# (they contain digit runs a phone pattern could claim), then IPv4,
# then phone-shaped digit runs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("phone", "\\+?[0-9][0-9()., -]{7,}[0-9]", "<PHONE>"),
]


def pii_redact(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """PII scrubbing for training corpora: replace email / IPv4 /
    phone-shaped spans with typed placeholder tokens and count each
    replacement class. The sibling of ``regex_scan`` that actually
    rewrites the text (scan counts, this one scrubs).

    Counts are taken on the intermediate text right before that
    pattern's own replacement (so an email's digits are never
    double-counted as a phone), making the (count, output) pair a
    deterministic function of the pattern order above. All JVM-side
    regexp_count/regexp_replace — scan-local, zero shuffle, no UDFs.
    """
    cur = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return df.select(F.col(id_col), *counts, cur.alias("redacted"))


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Okapi BM25 relevance ranking of documents against a pinned
    query-term set (Robertson & Spärck Jones) — the retrieval/quality
    scoring step a curation pipeline uses to up-weight documents that
    look like a reference corpus.

    Scale shape: per-document term frequencies are scan-local
    ``size(filter(tokens, t == q))`` per query term (the query set is
    tiny by nature — no explode, no per-token shuffle); document
    frequencies and average length ride ONE global aggregate broadcast
    back as a 1-row crossJoin; the final top-k is a
    TakeOrderedAndProject (heap per partition + driver merge of k),
    never a full sort. ln is IEEE-identical across engines.
    """
    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("_tok"))
    tf_cols = [
        F.size(F.filter(F.col("_tok"), lambda t: t == F.lit(q))).alias(f"_tf_{i}")
        for i, q in enumerate(query_terms)
    ]
    scored0 = base.select(F.col(id_col), F.size("_tok").alias("dl"), *tf_cols)
    stats = scored0.agg(
        F.count("*").alias("_n_docs"),
        F.avg("dl").alias("_avg_dl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("bigint")).alias(f"_df_{i}")
            for i in range(len(query_terms))
        ],
    )
    joined = scored0.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        tf = F.col(f"_tf_{i}").cast("double")
        dfq = F.col(f"_df_{i}").cast("double")
        ndocs = F.col("_n_docs").cast("double")
        idf = F.log((ndocs - dfq + 0.5) / (dfq + 0.5) + 1.0)
        part = idf * (
            tf * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * F.col("dl") / F.col("_avg_dl")))
        )
        score = part if score is None else score + part
    out = joined.select(F.col(id_col), F.col("dl"), score.alias("bm25"))
    return out.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)
