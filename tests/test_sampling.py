"""Dataset-assembly operators: deterministic sampling + sequence packing.

Oracles here are pure-Python replays (hashlib.md5 + running sums) so the
tests are exact, not statistical: the keep/pack decision is a deterministic
function of (doc_id, lang, text) and must be bit-identical regardless of
partition layout.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from kartograph_spark.datapipe import sampling

DOCS = [
    # en docs: rate 0.5 -> bucket < 32768
    *[
        {"doc_id": i, "lang": "en", "text": f"english doc {i} " + "tok " * (i % 7)}
        for i in range(40)
    ],
    # de docs: default rate 0.2 -> bucket < 13107
    *[
        {"doc_id": 100 + i, "lang": "de", "text": f"deutsch {i} " + "wort " * (i % 5)}
        for i in range(40)
    ],
]


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sampling")
    pdf = pd.DataFrame(DOCS)
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_stratified_sample_exact(spark, docs_dir):
    got = {
        (r.doc_id, r.lang, r.bucket)
        for r in sampling.stratified_sample(spark, docs_dir).collect()
    }
    want = set()
    for row in DOCS:
        b = _bucket(row["doc_id"])
        rate = sampling.SAMPLE_RATES.get(row["lang"], sampling.DEFAULT_RATE)
        if b < int(rate * sampling.HASH_MOD):
            want.add((row["doc_id"], row["lang"], b))
    assert got == want
    # both strata must actually be exercised
    assert {l for _, l, _ in got} == {"en", "de"}


def test_stratified_sample_partition_invariant(spark, docs_dir, tmp_path):
    base = sampling.stratified_sample(spark, docs_dir)
    # rewrite the corpus under a different physical layout: same decision
    one = str(tmp_path / "one")
    spark.read.parquet(f"{docs_dir}/documents.parquet").repartition(7).write.parquet(
        f"{one}/documents.parquet"
    )
    again = sampling.stratified_sample(spark, one)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, again.collect()))


def _expected_packing(budget: int, shards: int) -> dict[tuple, tuple]:
    staged = []
    for row in DOCS:
        staged.append(
            (
                row["lang"],
                _bucket(row["doc_id"]) % shards,
                row["doc_id"],
                len(row["text"].split(" ")),
            )
        )
    out: dict[tuple, list] = {}
    cum: dict[tuple, int] = {}
    for lang, shard, doc_id, toks in sorted(staged, key=lambda t: (t[0], t[1], t[2])):
        start = cum.get((lang, shard), 0)
        cum[(lang, shard)] = start + toks
        pack = start // budget
        agg = out.setdefault((lang, shard, pack), [0, 0, doc_id])
        agg[0] += 1
        agg[1] += toks
        agg[2] = min(agg[2], doc_id)
    return {k: tuple(v) for k, v in out.items()}


def test_seq_packing_exact(spark, docs_dir):
    got = {
        (r.lang, r.shard, r.pack_id): (r.n_docs, r.sum_tokens, r.first_doc)
        for r in sampling.seq_packing(spark, docs_dir).collect()
    }
    assert got == _expected_packing(sampling.PACK_BUDGET, sampling.PACK_SHARDS)


def test_seq_packing_small_budget_rolls_over(spark, docs_dir):
    # budget smaller than most docs: packs still deterministic, every doc
    # lands exactly once, pack_ids within a (lang, shard) are the offsets
    budget, shards = 5, 4
    rows = sampling.seq_packing(spark, docs_dir, budget=budget, shards=shards).collect()
    got = {
        (r.lang, r.shard, r.pack_id): (r.n_docs, r.sum_tokens, r.first_doc)
        for r in rows
    }
    assert got == _expected_packing(budget, shards)
    assert sum(v[0] for v in got.values()) == len(DOCS)
