"""Benchmark decontamination: n-gram overlap against an eval set.

The standard pretraining hygiene step (used for GPT-3/PaLM-style
training-set decontamination): a corpus document is *contaminated* when
it shares at least ``min_overlap`` distinct word n-grams with any
document of a held-out evaluation benchmark. Production settings use
8-13-gram overlap; the n is a knob here (the catalog entry pins n=3 so
the tiny synthetic corpus produces a non-trivial flagged set).

Scale shape (100 TB corpus, small benchmark): the benchmark side is
inherently tiny — eval suites are thousands of documents, not billions —
so its exploded distinct-shingle set is broadcast and the corpus-side
scan never shuffles: tokenize -> shingle -> explode runs scan-local,
the broadcast hash join filters to shingle hits, and the only exchange
is the per-doc partial-agg groupBy of the (rare) hits. The final
flag join back to the corpus doc list is a shuffle of (doc_id) pairs
only. No UDFs anywhere — the whole path is codegen Column algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles
from .text import tokens


def _doc_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, shingle) rows, distinct within each document."""
    base = df.select(F.col(id_col), tokens(text_col).alias("_tok"))
    return base.select(
        F.col(id_col), F.explode(word_shingles(F.col("_tok"), n)).alias("shingle")
    )


def eval_ngram_overlap(
    corpus: DataFrame,
    eval_set: DataFrame,
    n: int = 3,
    min_overlap: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str = "eval_id",
) -> DataFrame:
    """Flag corpus documents overlapping the evaluation benchmark.

    Returns one row per corpus document:
      - ``n_shared_ngrams``: distinct word n-grams the document shares
        with the union of all benchmark documents
      - ``n_eval_docs``: distinct benchmark documents sharing >=1 n-gram
      - ``contaminated``: n_shared_ngrams >= min_overlap

    The eval side is broadcast (benchmarks are small by construction);
    pass a pre-deduplicated benchmark if eval docs repeat.
    """
    corp_sh = _doc_shingles(corpus, text_col, id_col, n)
    ev_sh = _doc_shingles(
        eval_set.select(F.col(id_col).alias(eval_id_col), F.col(text_col)),
        text_col,
        eval_id_col,
        n,
    )
    hits = corp_sh.join(F.broadcast(ev_sh), "shingle")
    agg = hits.groupBy(id_col).agg(
        F.countDistinct("shingle").alias("n_shared_ngrams"),
        F.countDistinct(eval_id_col).alias("n_eval_docs"),
    )
    return (
        corpus.select(F.col(id_col))
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_shared_ngrams"), F.lit(0)).alias("n_shared_ngrams"),
            F.coalesce(F.col("n_eval_docs"), F.lit(0)).alias("n_eval_docs"),
            (F.coalesce(F.col("n_shared_ngrams"), F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )
