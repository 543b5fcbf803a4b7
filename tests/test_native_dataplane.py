"""Native C++ data plane: builds, and matches the Python packing exactly."""

import numpy as np
import pytest

from iadr1_tpu import native
from iadr1_tpu.data.packing import greedy_knapsack, pack_examples
from iadr1_tpu.data.tokenize import IGNORE_INDEX


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_knapsack_matches_python(lib):
    rng = np.random.default_rng(0)
    lengths = rng.integers(5, 120, 200).astype(np.int64)
    capacity = 256

    indices = np.zeros(len(lengths), np.int64)
    bin_sizes = np.zeros(len(lengths), np.int64)
    n_bins = lib.greedy_knapsack(
        native.as_i64(lengths), len(lengths), capacity,
        native.as_i64(indices), native.as_i64(bin_sizes),
    )
    # same bin count and same multiset of bin contents as the Python version
    py_bins = greedy_knapsack(lengths.tolist(), capacity)
    assert n_bins == len(py_bins)
    native_bins = []
    pos = 0
    for b in range(n_bins):
        cnt = int(bin_sizes[b])
        native_bins.append(sorted(int(lengths[i]) for i in indices[pos:pos + cnt]))
        pos += cnt
    assert sorted(map(tuple, native_bins)) == sorted(
        tuple(sorted(b)) for b in py_bins
    )
    # every index used exactly once
    assert sorted(indices.tolist()) == list(range(len(lengths)))


def test_native_pack_matches_python(lib):
    rng = np.random.default_rng(1)
    examples = []
    for i in range(50):
        n = int(rng.integers(4, 60))
        ids = rng.integers(1, 1000, n).tolist()
        labels = list(ids)
        labels[: n // 2] = [IGNORE_INDEX] * (n // 2)
        examples.append({"input_ids": ids, "labels": labels, "extras": {"i": i}})

    rows_native = pack_examples(examples, 128, pad_token_id=0, use_native=True)
    rows_py = pack_examples(examples, 128, pad_token_id=0, use_native=False)

    def signature(rows):
        # per-row token content is order-dependent within a bin, but bins
        # with identical lengths may differ in which example they picked;
        # compare total token accounting + per-row structural invariants
        total = sum(int((r["segment_ids"] != 0).sum()) for r in rows)
        return len(rows), total

    assert signature(rows_native) == signature(rows_py)
    for r in rows_native:
        segs = r["segment_ids"]
        real = segs != 0
        assert (r["labels"][~real] == IGNORE_INDEX).all()
        assert (r["input_ids"][~real] == 0).all()
        for s in np.unique(segs[real]):
            span = r["position_ids"][segs == s]
            assert list(span) == list(range(len(span)))
    # extras carried per packed segment, one per example overall
    seen = sorted(e["i"] for r in rows_native for e in r["extras"])
    assert seen == list(range(50))
