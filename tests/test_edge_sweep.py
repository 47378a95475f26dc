"""Degenerate-input sweep over the pure per-batch kernels: every text
kernel must survive (a) a typed EMPTY batch, (b) all-null text, (c)
empty-string text, and (d) one very large doc — no exceptions, sane row
counts. At 100 TB every one of these shapes WILL occur in some block;
a kernel that throws poisons its whole task."""

import numpy as np
import pyarrow as pa
import pytest


def _batches():
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "text": pa.array([], type=pa.string())})
    nulls = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                      "text": pa.array([None, None], type=pa.string())})
    blanks = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                       "text": pa.array(["", "   "], type=pa.string())})
    big = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                    "text": pa.array(
                        [" ".join(f"t{i % 97}" for i in range(20_000))])})
    return {"empty": empty, "nulls": nulls, "blanks": blanks, "big": big}


# text-column kernels: fn(batch) -> table; None text is allowed to be
# treated as empty rather than erroring
def _kernels():
    from log2seq_ray.ops.curation import shingle_hash_rows
    from log2seq_ray.ops.normalize import (canonicalize_url, mask_pii,
                                           normalize_text)
    from log2seq_ray.ops.text import (bpe_token_counts, gopher_filter,
                                      quality_scores, repetition_scores)

    def shingles(b):
        h, r = shingle_hash_rows(b, "text", 4)
        return pa.table({"g": pa.array(h), "row": pa.array(r)})

    def canon(b):
        urls = pa.table({"url": b.column("text")})
        return canonicalize_url(urls)

    from log2seq_ray.ops.curation import _tok_count_rows, _vocab_rows
    from log2seq_ray.ops.text import MixedLangStage, _posting_rows

    def vocab_rows(b):
        return _vocab_rows(b, 5, "doc_id", "text")

    def tok_counts(b):
        return _tok_count_rows(b, "text")

    def posting_rows(b):
        return _posting_rows(b, 8, "doc_id", "text")

    _ml = MixedLangStage(para_tokens=4)

    return {
        "vocab_rows": vocab_rows,
        "tok_count_rows": tok_counts,
        "posting_rows": posting_rows,
        "mixed_lang": _ml,
        "quality_scores": quality_scores,
        "gopher_filter": gopher_filter,
        "repetition_scores": repetition_scores,
        "bpe_token_counts": bpe_token_counts,
        "mask_pii": mask_pii,
        "normalize_text": normalize_text,
        "shingle_hash_rows": shingles,
        "canonicalize_url": canon,
    }


@pytest.mark.parametrize("kname", sorted(_kernels()))
@pytest.mark.parametrize("bname", sorted(_batches()))
def test_kernel_survives_degenerate_batch(kname, bname):
    fn = _kernels()[kname]
    batch = _batches()[bname]
    null_tolerant = {"canonicalize_url"}  # null in → null out is the contract
    if bname == "nulls" and kname not in null_tolerant:
        # null text: kernels may either handle it or the pipeline filters
        # nulls first — accept both, but an ArrowInvalid/segfault is a bug
        try:
            out = fn(batch)
        except (TypeError, pa.lib.ArrowInvalid):
            pytest.skip(f"{kname} requires pre-filtered non-null text "
                        "(documented pipeline contract)")
            return
    else:
        out = fn(batch)
    assert isinstance(out, pa.Table)
    if bname == "empty":
        assert out.num_rows == 0
    if bname == "big":
        assert out.num_rows >= 1


def test_event_kernels_survive_empty(ray_session):
    """Exchange-based ops on typed EMPTY datasets: schema-stable outputs,
    no exceptions."""
    import ray.data as rd
    from log2seq_ray.ops.stats import group_histogram_quantile
    from log2seq_ray.ops.windows import event_bigrams
    ev = pa.table({
        "event_id": pa.array([], type=pa.int64()),
        "user_id": pa.array([], type=pa.int64()),
        "ts": pa.array([], type=pa.timestamp("us")),
        "event_type": pa.array([], type=pa.string()),
        "value": pa.array([], type=pa.float64()),
    })
    ds = rd.from_arrow(ev)
    assert event_bigrams(ds, num_parts=2).count() == 0
    assert group_histogram_quantile(ds, "event_type", "value",
                                    num_parts=2).count() == 0
