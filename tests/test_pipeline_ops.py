"""Training-data assembly operators (operators/pipeline.py): splits,
repetition filters, PII scrub, contamination, packing — planted-fixture
behavior; cross-engine parity is covered by the registered oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from fundamental_spark.operators.pipeline import (
    contamination_check,
    pack_sequences,
    pii_scrub,
    repetition_metrics,
    with_split,
)


def test_split_deterministic_and_disjoint(spark):
    docs = spark.createDataFrame(
        [(str(i), "some text") for i in range(1000)], "doc_id string, text string"
    )
    a = {r["doc_id"]: r["split"] for r in with_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in with_split(docs).collect()}
    assert a == b  # pure function of the id
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > 900  # 98% expected, hash noise allowed
    assert c["val"] + c["test"] < 100


def test_repetition_metrics_flags_spam(spark):
    docs = spark.createDataFrame(
        [
            ("spam", "buy now " * 30),                  # one bigram dominates
            ("ok", " ".join(f"w{i}" for i in range(60))),  # all distinct
            ("single", "lonely"),                       # no bigrams at all
        ],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    assert got["spam"]["keep"] is False
    assert got["spam"]["top_bigram_frac"] > 0.4
    assert got["spam"]["dup_unigram_frac"] > 0.9
    assert got["ok"]["keep"] is True
    assert got["ok"]["dup_unigram_frac"] == 0.0
    assert got["single"]["keep"] is True
    assert got["single"]["top_bigram_frac"] == 0.0


def test_pii_scrub_planted(spark):
    docs = spark.createDataFrame(
        [
            ("a", "contact jan.devries+x@example-site.nl or 06 1234 5678 90 ok"),
            ("b", "clean text with no identifiers at all"),
            ("c", "two mails x@y.org and z@w.io"),
        ],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert got["a"]["n_emails"] == 1 and got["a"]["n_phones"] == 1
    assert "<EMAIL>" in got["a"]["redacted"] and "<PHONE>" in got["a"]["redacted"]
    assert "example-site" not in got["a"]["redacted"]
    assert got["b"]["n_emails"] == 0 and got["b"]["n_phones"] == 0
    assert got["b"]["redacted"] == "clean text with no identifiers at all"
    assert got["c"]["n_emails"] == 2


def test_contamination_check_planted(spark):
    bench = spark.createDataFrame(
        [("q1", "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id string, text string",
    )
    docs = spark.createDataFrame(
        [
            ("leak", "intro words then the quick brown fox jumps over the fence"),
            ("clean", " ".join(f"tok{i}" for i in range(20))),
        ],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r["overlap_ngrams"] for r in
           contamination_check(docs, bench, n=5).collect()}
    assert "leak" in got and got["leak"] >= 1  # shares 'the quick brown fox jumps'
    assert "clean" not in got


def test_pack_sequences_sequential_fill(spark):
    # 10-token docs, ctx=32: bins hold ~3 docs; shards independent
    docs = spark.createDataFrame(
        [(f"{s}{i:02d}", s, " ".join(["t"] * 10)) for s in ("en", "fr") for i in range(7)],
        "doc_id string, lang string, text string",
    )
    packed = pack_sequences(docs, ctx=32).collect()
    bins = {(r["shard"], r["doc_id"]): r["bin"] for r in packed}
    # doc k (0-indexed) has cum_before = 10k -> bin = floor(10k/32)
    for s in ("en", "fr"):
        for i in range(7):
            assert bins[(s, f"{s}{i:02d}")] == (10 * i) // 32
    # bins are monotone within a shard and restart per shard
    assert bins[("en", "en00")] == 0 and bins[("fr", "fr00")] == 0
