"""AccumLoader + DevicePrefetcher unit tests."""

import numpy as np

from uniter_tpu.data.loader import AccumLoader, DevicePrefetcher


def test_accum_loader_stacks_same_shape():
    def gen():
        for i in range(8):
            t = 16 if i % 2 == 0 else 32  # two bucket shapes interleaved
            yield {"x": np.full((4, t), i), "ex_weight": np.ones(4)}

    out = list(AccumLoader(gen(), accum=2))
    # 4 of each shape -> 2 stacked batches per shape
    assert len(out) == 4
    for b in out:
        assert b["x"].shape[0] == 2  # accum axis
        # grouped by identical shape
        assert b["x"].shape[2] in (16, 32)
    # identity when accum == 1
    out1 = list(AccumLoader(gen(), accum=1))
    assert len(out1) == 8


def test_device_prefetcher_order_and_errors():
    items = list(range(10))
    pf = DevicePrefetcher(iter(items), lambda x: x * 2, depth=3)
    assert list(pf) == [x * 2 for x in items]

    def bad(x):
        if x == 3:
            raise ValueError("boom")
        return x

    pf = DevicePrefetcher(iter(items), bad, depth=2)
    got = []
    try:
        for v in pf:
            got.append(v)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    assert got == [0, 1, 2]
