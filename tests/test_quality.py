"""Corpus-quality operators: repetition metrics, source rollup,
decontamination.

Oracles are pure-Python replays (collections.Counter + hashlib.md5), so
the expected values are exact: planted repetition and planted
contamination must surface with the precise counts, and clean docs must
not be flagged.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pandas as pd
import pytest

from kartograph_spark.datapipe import quality

# doc 0 shares a verbatim NGRAM-run with doc 9000 (planted contamination
# pair); doc 1 is heavy repetition; doc 2 is all-distinct; doc 3 is a
# single token (bigram guard)
SHARED = "alpha beta gamma delta epsilon zeta"
DOCS = [
    {"doc_id": 0, "text": f"lead in {SHARED} tail words here", "lang": "en",
     "source": "s0"},
    {"doc_id": 1, "text": "spam spam spam spam ham spam", "lang": "en",
     "source": "s0"},
    {"doc_id": 2, "text": "one two three four five six seven", "lang": "de",
     "source": "s1"},
    {"doc_id": 3, "text": "solo", "lang": "de", "source": "s1"},
    {"doc_id": 9000, "text": f"prefix {SHARED} suffix", "lang": "en",
     "source": "s1"},
    # filler docs so both strata have volume
    *[
        {"doc_id": 100 + i, "text": f"filler doc number {i} body text",
         "lang": "en", "source": f"s{i % 2}"}
        for i in range(20)
    ],
]


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("quality")
    pdf = pd.DataFrame(DOCS)
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_repetition_metrics_exact(spark, docs_dir):
    got = {r.doc_id: r for r in quality.repetition_metrics(spark, docs_dir).collect()}
    assert len(got) == len(DOCS)
    for row in DOCS:
        toks = row["text"].split(" ")
        n = len(toks)
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        r = got[row["doc_id"]]
        assert r.n_tokens == n
        assert r.distinct_ratio == round(len(set(toks)) / n, 4)
        assert r.top_token_ratio == round(max(Counter(toks).values()) / n, 4)
        want_big = (
            round(max(Counter(bigrams).values()) / (n - 1), 4) if n > 1 else 0.0
        )
        assert r.top_bigram_ratio == want_big
    # the planted repetition doc is the worst offender
    assert got[1].top_token_ratio == round(5 / 6, 4)
    assert got[3].top_bigram_ratio == 0.0


def test_source_rollup_exact(spark, docs_dir):
    got = {
        (r.source, r.lang): (r.n_docs, r.sum_tokens, r.avg_chars, r.n_quality)
        for r in quality.source_rollup(spark, docs_dir).collect()
    }
    want = {}
    for row in DOCS:
        key = (row["source"], row["lang"])
        toks = len(row["text"].split(" "))
        n, s, chars, q = want.get(key, (0, 0, 0, 0))
        want[key] = (
            n + 1,
            s + toks,
            chars + len(row["text"]),
            q + (toks >= quality.QUALITY_MIN_TOKENS),
        )
    want = {
        k: (n, s, round(chars / n, 2), q) for k, (n, s, chars, q) in want.items()
    }
    assert got == want


def _expected_decon(eval_fraction: float = quality.EVAL_FRACTION):
    thresh = int(eval_fraction * quality.HASH_MOD)
    k = quality.NGRAM
    shingles = {}
    for row in DOCS:
        toks = row["text"].split(" ")
        if len(toks) >= k:
            shingles[row["doc_id"]] = {
                " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
            }
    eval_set = set().union(
        *(s for d, s in shingles.items() if _bucket(d) < thresh), set()
    )
    out = {}
    for d, s in shingles.items():
        if _bucket(d) >= thresh:
            hits = len(s & eval_set)
            if hits:
                out[d] = (hits, len(s), round(hits / len(s), 4))
    return out


def test_decontaminate_planted_pair(spark, docs_dir, monkeypatch):
    # pick the fraction so exactly one of the planted pair is held out:
    # buckets are md5-derived, so find a threshold separating 0 and 9000
    b0, b9 = _bucket(0), _bucket(9000)
    lo, hi = min(b0, b9), max(b0, b9)
    frac = (lo + 1) / quality.HASH_MOD
    monkeypatch.setattr(quality, "EVAL_FRACTION", frac)
    got = {
        r.doc_id: (r.n_hits, r.n_shingles, r.hit_ratio)
        for r in quality.decontaminate(spark, docs_dir).collect()
    }
    want = _expected_decon(frac)
    assert got == want
    # the training-side member of the planted pair is flagged with at
    # least the shared run's worth of n-grams
    train_doc = 0 if b0 > b9 else 9000
    n_shared = len(SHARED.split(" ")) - quality.NGRAM + 1
    assert train_doc in got
    assert got[train_doc][0] >= n_shared
    # the held-out doc itself is never in the output
    held = 9000 if train_doc == 0 else 0
    assert held not in got


def test_decontaminate_default_fraction(spark, docs_dir):
    got = {
        r.doc_id: (r.n_hits, r.n_shingles, r.hit_ratio)
        for r in quality.decontaminate(spark, docs_dir).collect()
    }
    assert got == _expected_decon()


def test_repetition_length_switch_book_doc(spark, tmp_path_factory):
    """The explode+groupBy twin and the HOF path produce bit-identical
    rows, and repetition_metrics routes a book-length doc through the
    exploded branch without changing any result."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]
    book = " ".join(rng.choice(vocab, size=quality.REPETITION_EXPLODE_MIN_TOKENS + 5000))
    docs = DOCS + [
        {"doc_id": 7777, "text": book, "lang": "en", "source": "s0"},
        # exactly at the threshold: stays on the HOF path
        {"doc_id": 7778,
         "text": " ".join(rng.choice(vocab, size=quality.REPETITION_EXPLODE_MIN_TOKENS)),
         "lang": "en", "source": "s0"},
    ]
    d = tmp_path_factory.mktemp("quality-book")
    pdf = pd.DataFrame(docs)
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(d / "documents.parquet", index=False)

    toks = spark.read.parquet(f"{d}/documents.parquet").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    hof = {r.doc_id: tuple(r) for r in quality._repetition_hof(toks).collect()}
    expl = {r.doc_id: tuple(r) for r in quality._repetition_exploded(toks).collect()}
    assert hof == expl  # bit-identical twins on every doc

    got = {r.doc_id: tuple(r) for r in quality.repetition_metrics(spark, str(d)).collect()}
    assert got == hof
    assert got[7777][1] == quality.REPETITION_EXPLODE_MIN_TOKENS + 5000
