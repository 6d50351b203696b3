"""Planted-fixture tests for dedup / text / similarity / multimodal ops
(the catalog parity tests check engine-vs-oracle; these check the
operators actually detect what they claim to detect)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_pipeline_for_detection_banking_fraud_spark.operators import (
    dedup,
    multimodal,
    similarity,
    text,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),        # exact dup of 0
    (2, "the quick brown fox jumps over the sleepy dog"),      # near dup of 0
    (3, "completely different content about spark engines and shuffles"),
    (4, "der hund und die katze sind nicht mit der maus"),     # German-ish
    (5, "  The   QUICK brown fox jumps over the lazy dog  "),  # 0 modulo ws/case
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup_groups(docs):
    out = {r.canonical_id: r.n_copies for r in dedup.exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0 and 1 byte-identical
    assert sum(out.values()) == len(DOCS)


def test_fingerprint_normalizes_ws_and_case(docs):
    fp = {r.doc_id: r.fp for r in text.fingerprint(docs).collect()}
    assert fp[0] == fp[1] == fp[5]
    assert fp[0] != fp[2]


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {(r.id_a, r.id_b): r.n_shared_bands
             for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert pairs.get((0, 1)) == 4          # identical: all bands agree
    assert (0, 2) in pairs                  # near dup shares >= 1 band
    assert (0, 3) not in pairs              # unrelated docs don't collide


def test_ngram_jaccard_scores(docs):
    out = {(r.id_a, r.id_b): r.jaccard
           for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert out[(0, 1)] == 1.0
    assert 0.3 <= out[(0, 2)] < 1.0
    assert (0, 3) not in out


def test_ngram_max_df_prefilters_hot_shingles(spark):
    """max_df drops stop-shingles BEFORE the bucket collect: a pair
    connected ONLY through a ubiquitous shingle disappears, while pairs
    sharing rare shingles keep their (undercounted) intersection."""
    from etl_pipeline_for_detection_banking_fraud_spark.operators import dedup as dd

    hot = "the quick brown"  # present in every doc -> df == n_docs
    rows = [
        (0, f"{hot} alpha beta gamma delta"),
        (1, f"{hot} alpha beta gamma delta"),   # true near-dup of 0
        (2, f"{hot} epsilon zeta eta theta"),
        (3, f"{hot} iota kappa lam mu"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    exact = {(r.id_a, r.id_b) for r in
             dd.ngram_jaccard_pairs(docs, threshold=0.05).collect()}
    capped_df = dd.ngram_jaccard_pairs(docs, threshold=0.05, max_df=3)
    capped = {(r.id_a, r.id_b) for r in capped_df.collect()}
    assert (0, 1) in exact and (0, 1) in capped  # rare-shingle pair survives
    assert (2, 3) in exact       # connected only through the hot shingle...
    assert (2, 3) not in capped  # ...which max_df prunes before collecting
    # the guard rides as a broadcast anti-join, not a second data shuffle
    plan = capped_df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti, BuildRight" in plan


def test_minhash_max_bucket_drops_degenerate_buckets(spark):
    """A clone flood (many byte-identical docs) shares every band; with
    max_bucket set the degenerate bucket is dropped pre-collect and the
    clone pairs vanish, while an unrelated near-dup pair survives."""
    from etl_pipeline_for_detection_banking_fraud_spark.operators import dedup as dd

    clones = [(i, "the same exact document body repeated verbatim here")
              for i in range(10)]
    pair = [(100, "completely different words forming another distinct text body"),
            (101, "completely different words forming another distinct text body")]
    docs = spark.createDataFrame(clones + pair, "doc_id bigint, text string")
    out = {(r.id_a, r.id_b) for r in
           dd.minhash_lsh_pairs(docs, max_bucket=5).collect()}
    assert (100, 101) in out
    assert not any(a < 10 and b < 10 for a, b in out)


def test_simhash_near_for_near_dups(docs):
    sh = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert sh[0] == sh[1]
    assert ham(sh[0], sh[2]) <= ham(sh[0], sh[3])


def test_simhash_near_pairs_block_lsh(docs):
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in dedup.simhash_near_pairs(docs, max_hamming=4).collect()}
    assert pairs.get((0, 1)) == 0          # identical docs: distance 0
    assert (0, 2) in pairs                  # near dup within hamming budget
    assert (0, 3) not in pairs              # unrelated doc too far


def test_lang_id_heuristic(docs):
    out = {r.doc_id: r.detected_lang for r in text.lang_id(docs).collect()}
    assert out[0] == "en"
    assert out[4] == "de"


def test_token_and_quality_stats(docs):
    stats = {r.doc_id: r for r in text.token_stats(docs).collect()}
    assert stats[0].n_tokens == 9
    assert stats[0].n_unique == 8  # 'the' twice
    q = {r.doc_id: r for r in text.quality_features(docs).collect()}
    assert q[0].stopword_ratio > 0
    assert q[3].punct_ratio == 0.0


VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [1.0, 0.0, 0.0, 0.0]),     # identical to 0
    (2, [0.9, 0.1, 0.0, 0.0]),     # close to 0
    (3, [0.0, 1.0, 0.0, 0.0]),     # orthogonal
    (4, [0.0, 0.0, 1.0, 0.0]),
]


@pytest.fixture(scope="module")
def vecs(spark):
    df = spark.createDataFrame(VECS, ["vec_id", "embedding"])
    return df.withColumn("embedding", F.col("embedding").cast("array<float>"))


def test_cosine_topk_exact(vecs):
    queries = vecs.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = similarity.cosine_topk(vecs, queries, k=2).collect()
    assert [r.neighbor_id for r in out] == [1, 2]
    assert out[0].cosine == pytest.approx(1.0)


def test_ann_lsh_identical_vector_cobuckets(vecs):
    queries = vecs.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = similarity.ann_lsh_topk(vecs, queries, k=3).collect()
    assert 1 in [r.neighbor_id for r in out]  # identical vec always co-buckets


def test_embedding_cosine_pairs_threshold(vecs):
    pairs = {(r.id_a, r.id_b) for r in dedup.embedding_cosine_pairs(vecs, threshold=0.95).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs


def test_multimodal_stub_features(docs):
    media = multimodal.to_binary_table(docs)
    out = {r.doc_id: r for r in multimodal.extract_features(media).collect()}
    assert out[0].n_bytes == len(DOCS[0][1].encode())
    assert out[0].first_byte == ord("t")
    assert out[0].media_type == "text/plain"


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"xx", "image/png")


def test_connected_components_chain_and_islands(spark):
    """A 4-node chain (transitive closure across pairs that never co-
    occur), a 2-node island, and a singleton-free output (nodes only
    come from pairs)."""
    from etl_pipeline_for_detection_banking_fraud_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a bigint, id_b bigint"
    )
    got = {
        r.node_id: r.cluster_id
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_star_matches_propagation(spark):
    """Differential: the large-star/small-star variant must produce the
    identical labeling on a seeded random graph (cliques + chains +
    islands mixed)."""
    import random

    from etl_pipeline_for_detection_banking_fraud_spark.operators import dedup

    rnd = random.Random(11)
    edges = {(rnd.randrange(150), rnd.randrange(150)) for _ in range(180)}
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "id_a bigint, id_b bigint"
    )
    prop = {
        r.node_id: r.cluster_id
        for r in dedup.connected_components(pairs, max_iterations=60).collect()
    }
    star = {
        r.node_id: r.cluster_id
        for r in dedup.connected_components_star(pairs).collect()
    }
    assert star == prop


def test_connected_components_star_handles_long_chains(spark):
    """A planted 61-node chain (diameter 60): min-label propagation's
    default budget refuses with a convergence error (it would need ~60
    rounds), while the star variant finishes in its default O(log n)
    budget with the correct single cluster."""
    from etl_pipeline_for_detection_banking_fraud_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a bigint, id_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs).collect()
    got = {
        r.node_id: r.cluster_id
        for r in dedup.connected_components_star(pairs).collect()
    }
    assert got == {i: 0 for i in range(61)}


def test_connected_components_reliable_checkpoint_mode(spark, tmp_path):
    """`checkpoint_dir` switches per-round lineage truncation to reliable
    checkpoint(dir) — the cluster-deployment mode that survives executor
    loss. Same labels as the localCheckpoint default, and the round
    state must actually land in the directory (that durability IS the
    mode's contract)."""
    from etl_pipeline_for_detection_banking_fraud_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a bigint, id_b bigint"
    )
    ckpt = tmp_path / "cc_ckpt"
    got = {
        r.node_id: r.cluster_id
        for r in dedup.connected_components(
            pairs, checkpoint_dir=str(ckpt)
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    assert any(ckpt.rglob("*"))  # round state was written durably

    star = {
        r.node_id: r.cluster_id
        for r in dedup.connected_components_star(
            pairs, checkpoint_dir=str(ckpt)
        ).collect()
    }
    assert star == got


def test_hash_sample_is_partition_independent_and_nested(spark, sf001):
    """The same rows are selected regardless of physical layout, and a
    smaller fraction's sample nests inside a larger one (fixed seed)."""
    from etl_pipeline_for_detection_banking_fraud_spark.operators import sampling

    doc = spark.read.parquet(f"{sf001}/documents.parquet").select("doc_id")
    ids_1part = {r.doc_id for r in sampling.hash_sample(doc.coalesce(1), 0.2).collect()}
    ids_16part = {r.doc_id for r in sampling.hash_sample(doc.repartition(16), 0.2).collect()}
    assert ids_1part == ids_16part and len(ids_1part) > 0
    ids_small = {r.doc_id for r in sampling.hash_sample(doc, 0.05).collect()}
    assert ids_small <= ids_1part
    # independent seed draws a different sample
    ids_seed2 = {r.doc_id for r in sampling.hash_sample(doc, 0.2, seed="s1").collect()}
    assert ids_seed2 != ids_1part


# ---------------------------------------------------------------------------
# Real WAV codec behind the multimodal seam
# ---------------------------------------------------------------------------


def _make_wav(sampwidth, rate, channels, samples):
    """Craft a WAV payload with the stdlib writer (samples are ints in
    the signed range of the width; 8-bit is stored unsigned +128)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        if sampwidth == 2:
            frames = b"".join(struct.pack("<h", s) for s in samples)
        else:
            frames = bytes((s + 128) & 0xFF for s in samples)
        w.writeframes(frames)
    return buf.getvalue()


def test_decode_wav_golden_16bit():
    """Known samples -> exact header fields and analytically computed
    peak/RMS."""
    samples = [0, 1000, -2000, 3000]  # rms = sqrt(14_000_000/4)
    payload = _make_wav(2, 8000, 1, samples)
    d = multimodal.decode_media(payload, "audio/wav")
    assert d["channels"] == 1
    assert d["sample_rate"] == 8000
    assert d["n_frames"] == 4
    assert d["duration_ms"] == 0  # 4 frames at 8kHz is 0.5ms -> floor 0
    assert d["peak"] == 3000
    assert abs(d["rms"] - (14_000_000 / 4) ** 0.5) < 1e-9


def test_decode_wav_golden_8bit_stereo():
    # stereo: frames interleave L/R; 6 samples = 3 frames
    samples = [10, -10, 20, -20, 127, -128]
    payload = _make_wav(1, 44100, 2, samples)
    d = multimodal.decode_media(payload, "audio/x-wav")
    assert d["channels"] == 2
    assert d["sample_rate"] == 44100
    assert d["n_frames"] == 3
    assert d["peak"] == 128
    expected_rms = (sum(s * s for s in samples) / 6) ** 0.5
    assert abs(d["rms"] - expected_rms) < 1e-9


def test_decode_media_other_types_still_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x89PNG", "image/png")


def test_wav_features_end_to_end(spark):
    """The Spark-side path: mixed WAV/non-WAV binary table through the
    Arrow-batched featurizer — real decode for WAV rows, schema-stable
    nulls for the rest."""
    silence = _make_wav(2, 16000, 1, [0] * 1600)  # 100ms of silence
    tone = _make_wav(2, 8000, 1, [1000, -1000] * 400)  # square-ish, 100ms
    rows = [
        (1, bytearray(silence), "audio/wav"),
        (2, bytearray(tone), "audio/wav"),
        (3, bytearray(b"not audio"), "text/plain"),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, content binary, media_type string"
    )
    out = {r.doc_id: r for r in multimodal.wav_features(media).collect()}
    assert out[1].duration_ms == 100 and out[1].peak == 0 and out[1].rms == 0.0
    assert out[2].duration_ms == 100 and out[2].peak == 1000
    assert abs(out[2].rms - 1000.0) < 1e-9
    assert out[2].sample_rate == 8000 and out[2].channels == 1
    assert out[3].channels is None and out[3].rms is None


# ---------------------------------------------------------------------------
# Round-5 curation operators: repetition, regex scan, centroids
# ---------------------------------------------------------------------------


def test_repetition_ratio_detects_loops(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),            # one trigram, repeated
            (2, "one two three four five six"),              # all distinct
            (3, "ab cd"),                                    # < n tokens
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in text.repetition_ratio(docs).collect()}
    assert out[1].n_ngrams == 4 and out[1].n_distinct == 1
    assert abs(out[1].repetition - 0.75) < 1e-12
    assert out[2].repetition == 0.0 and out[2].n_distinct == 4
    assert out[3].n_ngrams == 0 and out[3].repetition == 0.0


def test_regex_scan_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d@e-f.org, card 12345678"),
            (2, "no personal data here"),
        ],
        ["doc_id", "text"],
    )
    pats = {
        "n_email": "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
        "n_digit_runs": "[0-9]{4,}",
    }
    out = {r.doc_id: r for r in text.regex_scan(docs, pats).collect()}
    assert out[1].n_email == 2 and out[1].n_digit_runs == 1
    assert out[2].n_email == 0 and out[2].n_digit_runs == 0


def test_centroid_norms_analytic(spark):
    """Two groups with hand-computed centroids: norms must be exact."""
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.0, 1.0], 0),   # centroid (0.5, 0.5) -> norm sqrt(0.5)
        (3, [2.0, 0.0], 1),
        (4, [4.0, 0.0], 1),   # centroid (3, 0) -> norm 3
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r.label: r for r in similarity.centroid_norms(emb).collect()}
    assert out[0].n_vecs == 2 and out[0].dim == 2
    assert abs(out[0].centroid_norm - 0.5 ** 0.5) < 1e-12
    assert abs(out[1].centroid_norm - 3.0) < 1e-12


def test_weighted_mix_rates_and_nesting(spark):
    """Per-source keep-rates land near their targets, and raising a
    rate only ADDS rows (nesting) — the property that makes mix tuning
    incremental instead of corpus-churning."""
    from etl_pipeline_for_detection_banking_fraud_spark.operators import sampling

    rows = [(i, f"src{i % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.1, "src3": 0.0}
    out = sampling.weighted_mix(df, rates).groupBy("source").count()
    got = {r.source: r["count"] for r in out.collect()}
    assert got["src0"] == 1000
    assert 400 < got.get("src1", 0) < 600
    assert 50 < got.get("src2", 0) < 160
    assert "src3" not in got

    low = {r.doc_id for r in sampling.weighted_mix(df, {"src1": 0.3}).collect()}
    high = {r.doc_id for r in sampling.weighted_mix(df, {"src1": 0.6}).collect()}
    assert low <= high  # nested


def test_pack_offsets_analytic(spark):
    """Hand-computed packing layout, including a straddling doc and a
    doc longer than the cap."""
    from etl_pipeline_for_detection_banking_fraud_spark.operators import packing

    rows = [
        (1, "en", 60), (2, "en", 50), (3, "en", 40),  # offsets 0,60,110
        (4, "de", 250),                                # longer than cap
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_tokens"])
    out = {r.doc_id: r for r in packing.pack_offsets(df, cap=100).collect()}
    assert (out[1].start_offset, out[1].bin_id, out[1].bin_spill) == (0, 0, 0)
    # doc 2 starts at 60, ends at 110 -> spills 10 past bin 0
    assert (out[2].start_offset, out[2].bin_id, out[2].bin_spill) == (60, 0, 10)
    assert (out[3].start_offset, out[3].bin_id) == (110, 1)
    # de shard independent; 250-token doc spills 150 past its first bin
    assert (out[4].start_offset, out[4].bin_id, out[4].bin_spill) == (0, 0, 150)


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap vs an eval set)
# ---------------------------------------------------------------------------

def test_decontaminate_flags_verbatim_and_partial_overlap(spark):
    from etl_pipeline_for_detection_banking_fraud_spark.operators import decontam

    eval_set = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),   # verbatim copy
            (1, "he said the quick brown fox ran away"),          # 2 shared trigrams
            (2, "quick brown dogs sleep all day"),                # 0 shared trigrams
            (3, "to be or not to be"),                            # disjoint
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in decontam.eval_ngram_overlap(
            corpus, eval_set, n=3, min_overlap=2
        ).collect()
    }
    assert len(out) == 4  # every corpus doc reported, hit or not
    # verbatim copy: all 7 trigrams of the 9-token eval doc shared
    assert (out[0].n_shared_ngrams, out[0].n_eval_docs, out[0].contaminated) == (
        7, 1, True)
    # 'the quick brown' + 'quick brown fox' shared -> at threshold
    assert (out[1].n_shared_ngrams, out[1].contaminated) == (2, True)
    assert (out[2].n_shared_ngrams, out[2].contaminated) == (0, False)
    assert (out[3].n_shared_ngrams, out[3].n_eval_docs, out[3].contaminated) == (
        0, 0, False)


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup
# ---------------------------------------------------------------------------

def test_semantic_dedup_keeps_first_drops_later_near_dups(spark, sf001):
    """Against the sf0.001 embeddings: every flagged dup must actually
    have a lower-id co-clustered vector over the threshold (verified by
    brute force), and no kept vector may have one."""
    import numpy as np

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    out = similarity.semantic_dedup(emb, threshold=0.4, center_fraction=0.05)
    rows = out.collect()
    assert len(rows) == emb.count()

    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    cluster = {r.vec_id: r.center_id for r in rows}

    def cos(a, b):
        return float(vecs[a] @ vecs[b] /
                     (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))

    for r in rows:
        prior = [
            cos(r.vec_id, other)
            for other, c in cluster.items()
            if c == r.center_id and other < r.vec_id
        ]
        expected_dup = bool(prior) and max(prior) >= 0.4
        assert r.is_dup == expected_dup, r
        if prior:
            assert r.max_prev_cos == pytest.approx(max(prior), abs=1e-9)
        else:
            assert r.max_prev_cos is None


# ---------------------------------------------------------------------------
# Real PPM codec behind the multimodal seam
# ---------------------------------------------------------------------------

def test_decode_ppm_golden():
    """Hand-built 2x2 P6 with a comment line in the header."""
    plane = bytes([
        255, 0, 0,    0, 255, 0,
        0, 0, 255,    255, 255, 255,
    ])
    payload = b"P6\n# test image\n2 2\n255\n" + plane
    d = multimodal.decode_media(payload, "image/ppm")
    assert (d["width"], d["height"], d["n_pixels"]) == (2, 2, 4)
    assert d["mean_r"] == pytest.approx((255 + 0 + 0 + 255) / 4)
    assert d["mean_g"] == pytest.approx((0 + 255 + 0 + 255) / 4)
    assert d["mean_b"] == pytest.approx((0 + 0 + 255 + 255) / 4)
    assert d["luma"] == pytest.approx(
        0.299 * d["mean_r"] + 0.587 * d["mean_g"] + 0.114 * d["mean_b"])


def test_decode_ppm_rejects_bad_payloads():
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P5\n1 1\n255\n\x00")  # not P6
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P6\n2 2\n255\n\x00\x00")  # truncated plane
    with pytest.raises(NotImplementedError):
        multimodal.decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def test_ppm_features_end_to_end(spark):
    """synth -> REAL decode round trip matches the pinned recurrence."""
    docs = spark.createDataFrame([(7,), (12,)], ["doc_id"])
    media = multimodal.synth_ppm_table(docs)
    out = {r.doc_id: r for r in multimodal.image_features(media).collect()}
    # doc 7: w=1+7%4=4, h=1+7%3=2
    assert (out[7].width, out[7].height, out[7].n_pixels) == (4, 2, 8)
    exp_r = sum((7 * 7 + (3 * j) * 11) % 256 for j in range(8)) / 8
    assert out[7].mean_r == pytest.approx(exp_r, abs=1e-12)
    # doc 12: w=1, h=1 -> single pixel, means are the exact byte values
    assert (out[12].width, out[12].height) == (1, 1)
    assert out[12].mean_r == (12 * 7 + 0) % 256
    assert out[12].mean_g == (12 * 7 + 11) % 256
    assert out[12].mean_b == (12 * 7 + 22) % 256


# ---------------------------------------------------------------------------
# Data-quality expectations
# ---------------------------------------------------------------------------

def test_dq_expectations_detect_planted_violations(spark):
    from etl_pipeline_for_detection_banking_fraud_spark.operators import dq

    rows = [
        (1, 10, 5.0),
        (1, 20, -1.0),   # duplicate key AND non-positive amount
        (2, None, 3.0),  # null fk
    ]
    df = spark.createDataFrame(rows, ["pk", "fk", "amount"])
    out = {
        r.check: r
        for r in dq.run_expectations(
            df,
            [
                dq.Check("nonempty", F.count("*"), ">=", 1.0),
                dq.Check("pk_dup", F.count("*") - F.countDistinct("pk"), "==", 0.0),
                dq.Check("fk_nulls", F.sum(F.col("fk").isNull().cast("long")),
                         "==", 0.0),
                dq.Check("amount_nonpositive",
                         F.sum((F.col("amount") <= 0).cast("long")), "==", 0.0),
            ],
        ).collect()
    }
    assert (out["nonempty"].value, out["nonempty"].passed) == (3.0, True)
    assert (out["pk_dup"].value, out["pk_dup"].passed) == (1.0, False)
    assert (out["fk_nulls"].value, out["fk_nulls"].passed) == (1.0, False)
    assert (out["amount_nonpositive"].value,
            out["amount_nonpositive"].passed) == (1.0, False)


def test_dq_single_aggregate_plan(spark):
    """All checks of one table ride ONE aggregate — the physical plan
    must contain exactly one pair of HashAggregates (partial+final) and
    one exchange, independent of check count."""
    from etl_pipeline_for_detection_banking_fraud_spark.operators import dq

    df = spark.range(100).select(F.col("id").alias("pk"))
    checks = [
        dq.Check(f"c{i}", F.sum((F.col("pk") % (i + 2) == 0).cast("long")),
                 ">=", 0.0)
        for i in range(8)
    ]
    plan = dq.run_expectations(df, checks)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "inline" in plan.lower() or "Generate" in plan


def test_dq_rejects_duplicate_names_and_bad_ops(spark):
    from etl_pipeline_for_detection_banking_fraud_spark.operators import dq

    df = spark.range(3)
    with pytest.raises(ValueError):
        dq.run_expectations(
            df,
            [dq.Check("a", F.count("*"), ">=", 0.0),
             dq.Check("a", F.count("*"), ">=", 0.0)],
        )
    with pytest.raises(ValueError):
        dq.run_expectations(
            df, [dq.Check("a", F.count("*"), "!=", 0.0)]
        ).collect()


# ---------------------------------------------------------------------------
# BPE-ish tokenizer + winnowing fingerprints
# ---------------------------------------------------------------------------

def test_bpe_token_stats_hand_example(spark):
    df = spark.createDataFrame(
        [(0, "don't stop me now, 42 times!")], ["doc_id", "text"]
    )
    r = text.bpe_token_stats(df).collect()[0]
    # don | 't | stop | me | now | , | 42 | times | ! -> 9 subword tokens
    assert (r.n_bpe_tokens, r.n_ws_tokens) == (9, 6)
    assert r.bpe_per_word == pytest.approx(9 / 6)


def test_winnow_guarantee_and_short_doc(spark):
    """Winnowing guarantee: two docs sharing a run of >= k+w-1 = 8 chars
    share at least one fingerprint; documents shorter than 8 chars emit
    no fingerprints; disjoint-alphabet docs share none."""
    df = spark.createDataFrame(
        [
            (0, "the miners went deep underground yesterday"),
            (1, "she said the miners went home early"),   # shares 'the miners went '
            (2, "zzzzqqqqxxxxwwww"),                       # disjoint content
            (3, "tiny"),                                   # < k+w-1 chars
        ],
        ["doc_id", "text"],
    )
    fps = text.winnow_fingerprints(df, k=5, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[0] & by_doc[1], "shared 8+ char run must share a fingerprint"
    assert not (by_doc[0] & by_doc[2])
    assert 3 not in by_doc
    # determinism: fingerprints are pure functions of content
    fps2 = text.winnow_fingerprints(df, k=5, w=4).collect()
    assert {(r.doc_id, r.fp) for r in fps} == {(r.doc_id, r.fp) for r in fps2}


def test_quantize_embeddings_bounds_and_roundtrip(spark):
    """SQ8 guarantee: reconstruction error is bounded by half a
    quantization step; constant vectors encode exactly."""
    rows = [
        (0, [0.0, 1.0, 0.5, 0.25]),
        (1, [2.0, 2.0, 2.0]),          # constant -> zero error
        (2, [-1.0, 1.0]),              # endpoints land exactly on codes
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r for r in similarity.quantize_embeddings(df).collect()}
    for vid, vec in [(0, rows[0][1]), (2, rows[2][1])]:
        r = out[vid]
        step = (max(vec) - min(vec)) / 255.0
        assert r.mean_abs_err <= step / 2 + 1e-12
        assert (r.dim, r.n_codes) == (len(vec), len(vec))
        assert (r.vmin, r.vmax) == (min(vec), max(vec))
    assert out[1].mean_abs_err == 0.0
    assert (out[1].vmin, out[1].vmax) == (2.0, 2.0)


def test_kmeans_converges_on_planted_clusters(spark):
    """Two tight planted blobs: after 2 Lloyd rounds every point sits
    with its blob-mates and iteration does not increase total cost."""
    from etl_pipeline_for_detection_banking_fraud_spark.operators import clustering

    blob_a = [[10.0 + dx, 10.0 + dy] for dx in (0.0, 0.3, -0.3) for dy in (0.0, 0.4)]
    blob_b = [[-10.0 + dx, -10.0 + dy] for dx in (0.0, 0.2, -0.2) for dy in (0.0, 0.5)]
    rows = [(i, v) for i, v in enumerate(blob_a + blob_b)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    # high fraction so the hash sample lands >= 2 initial centers
    out1 = {r.vec_id: r for r in
            clustering.kmeans_assign(df, n_iter=1, center_fraction=0.35).collect()}
    out2 = {r.vec_id: r for r in
            clustering.kmeans_assign(df, n_iter=2, center_fraction=0.35).collect()}
    # no center serves both blobs (they are 20 apart; the hash sample
    # may land several centers inside one blob, which legitimately
    # splits that blob's points among them)
    a_ids = {out2[i].center_id for i in range(6)}
    b_ids = {out2[i].center_id for i in range(6, 12)}
    assert not (a_ids & b_ids)
    # every point's final distance is intra-blob scale, not inter-blob
    assert all(r.dist < 5.0 for r in out2.values())
    cost1 = sum(r.dist for r in out1.values())
    cost2 = sum(r.dist for r in out2.values())
    assert cost2 <= cost1 + 1e-9  # Lloyd is monotone


def test_pagerank_mass_conservation_and_ordering(spark):
    """Star-plus-chain planted graph: total rank mass is conserved
    (dangling redistribution), and the node every edge points at
    outranks the leaves."""
    from etl_pipeline_for_detection_banking_fraud_spark.operators import graph

    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "sink")],
        ["src", "dst"],
    )
    out = {r.node: r.rank for r in graph.pagerank(edges, n_iter=5).collect()}
    assert set(out) == {"a", "b", "c", "hub", "sink"}
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-9)
    assert out["hub"] > out["a"] == out["b"] == out["c"]
    assert out["sink"] > out["a"]  # fed by the hub
    # duplicate edges must not double-count
    dup = spark.createDataFrame(
        [("a", "hub"), ("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "sink")],
        ["src", "dst"],
    )
    out_dup = {r.node: r.rank for r in graph.pagerank(dup, n_iter=5).collect()}
    assert out_dup == out
