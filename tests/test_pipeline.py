"""The north-rule invariant: span-sequence equality (kind, text, media_ref,
order) between the engine's out_spans and the closed-form expected output,
per document. Mirrors the reference's fixture-driven e2e tests
(/root/reference/tests/test_detection.py, test_recognition.py,
test_table_rec.py) — the surrogate slots stand in for the models on both
sides, so equality is exact."""

from __future__ import annotations

import pytest

from surya_spark import datagen, pipeline

N_DOCS = 40


@pytest.fixture(scope="module")
def out_rows(spark):
    docs = datagen.gen_documents(spark, N_DOCS, partitions=4)
    blobs = datagen.gen_page_blobs(spark, N_DOCS, partitions=4)
    out = pipeline.extract(docs, blobs, with_tables=True)
    return {r["doc_id"]: r["spans"] for r in out.collect()}


def test_all_docs_present(out_rows):
    assert len(out_rows) == N_DOCS


def test_span_sequence_equality(out_rows):
    for doc_idx in range(N_DOCS):
        doc_id = f"doc-{doc_idx:09d}"
        expected = datagen.expected_out_spans(doc_idx)
        got = [
            {"kind": s["kind"], "text": s["text"],
             "media_ref": s["media_ref"], "offset": s["offset"]}
            for s in out_rows[doc_id]
        ]
        assert got == expected, f"span mismatch for {doc_id}"


def test_offsets_are_sequential(out_rows):
    for spans in out_rows.values():
        assert [s["offset"] for s in spans] == list(range(len(spans)))
