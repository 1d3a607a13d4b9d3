"""Text-analysis functions (langid, quality, tokens, fingerprint) and
multimodal plumbing (media explode, feature extraction, thumbnails)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fundamental_spark.crawl.parse import parse_spans_udf
from fundamental_spark.functions.text import with_text_features
from fundamental_spark.operators.multimodal import (
    extract_media_features,
    media_from_documents,
    resize_thumbnails,
    sample_video_frames,
)
from fundamental_spark.synth.site import build_site


def test_langid_and_features(spark):
    docs = spark.createDataFrame(
        [
            ("e1", "the cat sat on the mat and it was the best of all"),
            ("s1", "el perro corre en la casa y es el mejor de los dos"),
            ("n1", "de hond loopt in het park en het is een mooie dag"),
            ("u1", "zzz qqq www"),
            ("p1", "hello, world!!! what?? yes; no: maybe..."),
        ],
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r for r in with_text_features(docs).collect()}
    assert rows["e1"]["lang_pred"] == "en"
    assert rows["s1"]["lang_pred"] == "es"
    assert rows["n1"]["lang_pred"] == "nl"
    assert rows["u1"]["lang_pred"] == "und"
    assert rows["p1"]["punct_ratio"] > 0.2
    assert rows["e1"]["n_tokens"] == 13
    assert rows["e1"]["n_bpe_tokens"] >= rows["e1"]["n_tokens"]
    assert 0.0 <= rows["e1"]["quality"] <= 1.0
    # fingerprint invariant under case/whitespace
    d2 = spark.createDataFrame(
        [("a", "Hello  World"), ("b", "hello world")], "doc_id string, text string"
    )
    fps = [r["fp"] for r in with_text_features(d2).collect()]
    assert fps[0] == fps[1]


@pytest.fixture(scope="module")
def media(spark):
    site = build_site(seed=3, cities=("breda",), listings_per_city=8)
    docs = spark.createDataFrame(
        list(site.detail_pages.items()), "doc_id string, html string"
    ).select("doc_id", parse_spans_udf(F.col("html")).alias("spans"))
    return media_from_documents(docs)


def test_media_explode_schema(media):
    rows = media.collect()
    assert len(rows) >= 16  # >=2 media per listing
    kinds = {r["kind"] for r in rows}
    assert kinds == {"photo", "floorplan"}
    r = rows[0]
    assert isinstance(r["content"], (bytes, bytearray))
    assert r["meta"]["width"] >= 32 and r["meta"]["mime"].startswith("image/")


def test_media_features_deterministic(media, spark):
    f1 = {(r["doc_id"], r["media_ref"]): r["feature"]
          for r in extract_media_features(media, dim=16).collect()}
    f2 = {(r["doc_id"], r["media_ref"]): r["feature"]
          for r in extract_media_features(media, dim=16).collect()}
    assert f1 == f2
    assert all(len(v) == 16 for v in f1.values())


def test_media_strict_mode_raises_without_decoder(media):
    import fundamental_spark.operators.multimodal as mm

    if mm.HAS_PIL:
        pytest.skip("decoder present")
    with pytest.raises(Exception):  # NotImplementedError inside executor
        extract_media_features(media, strict=True).collect()


def test_thumbnails_aspect(media):
    rows = resize_thumbnails(media, max_px=128).collect()
    assert all(max(r["width"], r["height"]) <= 128 for r in rows)
    assert all(r["width"] > 0 and r["height"] > 0 for r in rows)


def test_video_frame_sampling(spark):
    m = spark.createDataFrame(
        [("d1", "v.mp4", "video", bytearray(b"x"),
          {"width": 640, "height": 480, "duration_ms": 3500, "mime": "video/mp4"})],
        "doc_id string, media_ref string, kind string, content binary, "
        "meta struct<width:int,height:int,duration_ms:int,mime:string>",
    )
    frames = sample_video_frames(m, every_ms=1000).collect()
    assert [f["frame_ts_ms"] for f in frames] == [0, 1000, 2000, 3000]


def test_bm25_ranking_and_topk(spark):
    from fundamental_spark.functions.text import bm25_topk

    docs = spark.createDataFrame(
        [
            # repeats the rare term in a short doc -> highest tf, low dl
            (1, "dup dup dup scan"),
            # one rare-term hit in a longer doc
            (2, "dup scan merge join filter sort window batch"),
            # common term only
            (3, "join scan merge"),
            # no query term at all -> must not appear
            (4, "scan merge filter sort"),
            # filler docs so idf('dup') > idf('join')
            (5, "join alpha beta"),
            (6, "join gamma delta"),
            (7, "join epsilon zeta"),
        ],
        "doc_id bigint, text string",
    )
    out = bm25_topk(docs, query_terms=("dup", "join"), k=10).collect()
    ids = [r.doc_id for r in out]
    assert 4 not in ids
    assert len(ids) == 6
    # the dup-heavy short doc dominates; the single-hit dup doc beats
    # any join-only doc (df(dup)=2 of 7 vs df(join)=5 of 7)
    assert ids[0] == 1
    scores = {r.doc_id: r.bm25 for r in out}
    assert scores[2] > max(scores[i] for i in (3, 5, 6, 7))
    by_id = {r.doc_id: r.n_terms_matched for r in out}
    assert by_id[1] == 1 and by_id[2] == 2 and by_id[3] == 1
    # k cap respected
    assert len(bm25_topk(docs, query_terms=("dup", "join"), k=2).collect()) == 2
