"""chunk_text / tfidf_top_terms edge cases beyond the oracle corpus:
empty and single-word documents, zero overlap, invalid overlap, and
chunk reconstruction."""

from __future__ import annotations

import pytest

from airflow_etl_minio_to_postgres_spark.functions.text import (
    chunk_text,
    tfidf_top_terms,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunk_text_reconstructs_with_zero_overlap(spark):
    words = [f"w{i}" for i in range(10)]
    out = sorted(
        chunk_text(_docs(spark, [" ".join(words)]), 4, overlap=0).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.chunk_id for r in out] == [0, 1, 2]
    assert " ".join(r.chunk_text for r in out) == " ".join(words)
    assert [r.n_chunk_tokens for r in out] == [4, 4, 2]


def test_chunk_text_overlap_repeats_boundary_tokens(spark):
    words = [f"w{i}" for i in range(6)]
    out = sorted(
        chunk_text(_docs(spark, [" ".join(words)]), 4, overlap=2).collect(),
        key=lambda r: r.chunk_id,
    )
    # starts 0,2,4: chunks w0-3, w2-5, w4-5
    assert [r.chunk_text for r in out] == ["w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5"]


def test_chunk_text_empty_and_single_word(spark):
    out = chunk_text(_docs(spark, ["", "   ", "solo"]), 4).collect()
    assert [(r.doc_id, r.chunk_text, r.n_chunk_tokens) for r in out] == [
        (2, "solo", 1)
    ]


def test_chunk_text_rejects_overlap_ge_chunk(spark):
    with pytest.raises(ValueError, match="overlap"):
        chunk_text(_docs(spark, ["a b"]), 4, overlap=4)


def test_tfidf_rare_term_outranks_common(spark):
    docs = _docs(
        spark,
        ["shared shared rareone", "shared shared raretwo", "shared common"],
    )
    top = {
        r.doc_id: r.word
        for r in tfidf_top_terms(docs, k=1).collect()
    }
    # 'shared' appears in every doc (idf floor); each doc's unique term wins
    assert top[0] == "rareone" and top[1] == "raretwo" and top[2] == "common"
