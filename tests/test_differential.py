"""Differential parity vs the reference on all 16 loghub example corpora
(32,000 real log lines): byte-identical message/words/symbols, equal header
fields and timestamps — on both extraction engines (RE2 and CPython re)."""

import pytest

from . import parity
from log2seq_ray.rules import loghub


@pytest.mark.parametrize("dataset", sorted(loghub.DATASETS))
def test_parity_re2(dataset):
    n, mism = parity.compare_dataset(dataset, force_python_re=False)
    assert n == 2000
    assert mism == [], f"{len(mism)} mismatches, first: {mism[0]}"


@pytest.mark.parametrize("dataset", ["OpenSSH", "BGL", "Mac", "Thunderbird"])
def test_parity_python_re(dataset):
    """The CPython-re fallback path must agree too (sampled datasets —
    the full pyre sweep runs in tests/parity.py ad hoc)."""
    n, mism = parity.compare_dataset(dataset, force_python_re=True)
    assert mism == [], f"{len(mism)} mismatches, first: {mism[0]}"
