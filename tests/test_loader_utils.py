"""AccumLoader + DevicePrefetcher unit tests."""

import numpy as np
import pytest

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


def test_looped_loader_smaller_than_one_batch_does_not_spin():
    """drop_last with a dataset smaller than every bucket's batch size must
    keep the padded partial batches — a looped loader previously yielded
    empty epochs forever (found driving train_vqa on a 4-example DB)."""
    import itertools

    from uniter_tpu.data.buckets import BucketSpec
    from uniter_tpu.data.sampler import StaticBucketSampler

    sizes = [(6, 5)] * 4  # all land in one bucket; batch size >> 4
    spec = BucketSpec(txt_buckets=(32,), img_buckets=(8,),
                      token_budget=512, size_mul=8)
    s = StaticBucketSampler(sizes, spec, shuffle=True, seed=0,
                            drop_last=True)
    assert len(s) == 1
    batches = list(itertools.islice(iter(s), 5))
    assert len(batches) == 1 and len(batches[0][1]) == 4
    # and a normal-size dataset still drops the tail
    s2 = StaticBucketSampler([(6, 5)] * 20, spec, shuffle=False,
                             drop_last=True)
    bs = s2.batch_size((32, 8))
    assert all(len(idxs) == bs for _, idxs in s2)


def test_crossed_boundary_cadence():
    """steps_per_call cadence: every log/valid boundary fires exactly once
    even when the boundary is not a multiple of k."""
    from uniter_tpu.training.loop import _crossed

    for k in (1, 3, 8):
        fired = [s for s in range(k, 2000 + k + 1, k) if _crossed(s, k, 500)]
        assert len(fired) == 4, (k, fired)  # 500,1000,1500,2000 each once
        assert all(s - k < b <= s for s, b in zip(fired, (500, 1000, 1500,
                                                          2000)))


class _SkipDs:
    """Minimal dataset for BucketLoader plan/RNG tests."""
    rows_per_example = 1

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def size_of(self, i):
        return (6, 5)

    def get_record(self, i, rng):
        return {"idx": i, "noise": int(rng.randint(1_000_000))}

    @staticmethod
    def collate(recs, t_b, r_b, bs):
        idx = np.full((bs,), -1, np.int64)
        noise = np.full((bs,), -1, np.int64)
        for j, r in enumerate(recs):
            idx[j] = r["idx"]
            noise[j] = r["noise"]
        return {"idx": idx, "noise": noise}


def _batches(loader, n):
    import itertools

    return list(itertools.islice(iter(loader), n))


def test_skip_batches_matches_uninterrupted_stream():
    """skip_batches(k) then read == read from position k: identical example
    plan AND identical per-record RNG stream (the 'noise' field), across an
    epoch boundary, with zero record fetches during the skip."""
    from uniter_tpu.data.buckets import BucketSpec
    from uniter_tpu.data.loader import BucketLoader

    spec = BucketSpec(txt_buckets=(8,), img_buckets=(8,),
                      token_budget=128, size_mul=8)

    def make():
        return BucketLoader(_SkipDs(40), spec, seed=5, loop=True)

    full = _batches(make(), 10)

    skipping = make()
    fetched = []
    orig = _SkipDs.get_record
    _SkipDs.get_record = lambda s, i, rng: fetched.append(i) or orig(
        s, i, rng)
    try:
        skipping.skip_batches(4)
        assert fetched == []  # nothing materialized yet
    finally:
        _SkipDs.get_record = orig
    tail = _batches(skipping, 6)
    for a, b in zip(full[4:], tail):
        np.testing.assert_array_equal(a["idx"], b["idx"])
        np.testing.assert_array_equal(a["noise"], b["noise"])


def test_loader_identical_across_num_workers():
    """The per-record seed derivation makes num_workers a pure throughput
    knob: batches are bit-identical with and without the thread pool."""
    from uniter_tpu.data.buckets import BucketSpec
    from uniter_tpu.data.loader import BucketLoader

    spec = BucketSpec(txt_buckets=(8,), img_buckets=(8,),
                      token_budget=128, size_mul=8)
    a = _batches(BucketLoader(_SkipDs(40), spec, seed=5, loop=True), 6)
    b = _batches(BucketLoader(_SkipDs(40), spec, seed=5, loop=True,
                              num_workers=3), 6)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["idx"], y["idx"])
        np.testing.assert_array_equal(x["noise"], y["noise"])


@pytest.mark.parametrize("wt", ["process", "shm"])
def test_loader_identical_with_process_workers(wt):
    """worker_type='process' (fork pool, workers collate shards, pickled
    back) and 'shm' (workers collate straight into a shared-memory ring)
    are the same pure throughput knob: batches bit-identical to serial."""
    from uniter_tpu.data.buckets import BucketSpec
    from uniter_tpu.data.loader import BucketLoader

    spec = BucketSpec(txt_buckets=(8,), img_buckets=(8,),
                      token_budget=128, size_mul=8)
    a = _batches(BucketLoader(_SkipDs(40), spec, seed=5, loop=True), 6)
    loader = BucketLoader(_SkipDs(40), spec, seed=5, loop=True,
                          num_workers=2, worker_type=wt)
    try:
        # shm batches view ring segments valid for `depth` batches — copy
        # each AS CONSUMED, like a real consumer's device transfer does
        import itertools
        b = [{k: np.array(v) for k, v in d.items()}
             for d in itertools.islice(iter(loader), 6)]
    finally:
        loader.close()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["idx"], y["idx"])
        np.testing.assert_array_equal(x["noise"], y["noise"])


class _EpochDs(_SkipDs):
    """new_epoch mutates dataset state (the ITM-negatives / RE-shuffle
    pattern) — fork pools must re-fork to see it."""

    def __init__(self, n):
        super().__init__(n)
        self.epoch_salt = 0

    def new_epoch(self, rng):
        self.epoch_salt += 1000

    def get_record(self, i, rng):
        return {"idx": i + self.epoch_salt,
                "noise": int(rng.randint(1_000_000))}


@pytest.mark.parametrize("wt", ["process", "shm"])
def test_epoch_resample_reaches_fork_workers(wt):
    """Epoch-2 batches must reflect dataset.new_epoch() mutations even
    though the records are decoded in forked workers (the pool re-forks
    after every resample)."""
    from uniter_tpu.data.buckets import BucketSpec
    from uniter_tpu.data.loader import BucketLoader

    spec = BucketSpec(txt_buckets=(8,), img_buckets=(8,),
                      token_budget=128, size_mul=8)
    n_epoch_batches = len(BucketLoader(_EpochDs(40), spec, seed=5))
    n = n_epoch_batches + 2  # reach into epoch 2
    a = _batches(BucketLoader(_EpochDs(40), spec, seed=5, loop=True), n)
    loader = BucketLoader(_EpochDs(40), spec, seed=5, loop=True,
                          num_workers=2, worker_type=wt)
    try:
        import itertools
        b = [{k: np.array(v) for k, v in d.items()}
             for d in itertools.islice(iter(loader), n)]
    finally:
        loader.close()
    assert (a[-1]["idx"] >= 1000).all()  # epoch-2 salt visible at all
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["idx"], y["idx"])
        np.testing.assert_array_equal(x["noise"], y["noise"])


class _PairedDs:
    """2 rows/example + a per-PAIR target key (the NLVR2-paired ratio
    shape) to exercise the shm layout's r_inv handling."""
    rows_per_example = 2

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def size_of(self, i):
        return (6, 5)

    def get_record(self, i, rng):
        return {"idx": i, "noise": int(rng.randint(1_000_000))}

    @staticmethod
    def collate(recs, t_b, r_b, bs):
        rows = np.full((bs * 2, 3), -1, np.int64)
        target = np.full((bs,), -1, np.int64)
        for j, r in enumerate(recs):
            rows[2 * j] = (r["idx"], r["noise"], 0)
            rows[2 * j + 1] = (r["idx"], r["noise"], 1)
            target[j] = r["noise"] % 2
        return {"rows": rows, "target": target,
                "qids": [r["idx"] for r in recs]}


@pytest.mark.parametrize("wt", ["process", "shm"])
def test_paired_ratio_keys_across_worker_types(wt):
    from uniter_tpu.data.buckets import BucketSpec
    from uniter_tpu.data.loader import BucketLoader

    spec = BucketSpec(txt_buckets=(8,), img_buckets=(8,),
                      token_budget=256, size_mul=8)
    a = _batches(BucketLoader(_PairedDs(40), spec, seed=5, loop=True), 6)
    loader = BucketLoader(_PairedDs(40), spec, seed=5, loop=True,
                          num_workers=2, worker_type=wt)
    try:
        import itertools
        b = [{k: (np.array(v) if isinstance(v, np.ndarray) else v)
              for k, v in d.items()}
             for d in itertools.islice(iter(loader), 6)]  # copy as consumed
    finally:
        loader.close()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["rows"], y["rows"])
        np.testing.assert_array_equal(x["target"], y["target"])
        assert x["qids"] == y["qids"]


def test_meta_loader_skip_steps():
    """skip_steps(n) then read == read from position n — task draw sequence,
    per-task loader positions, and a partially consumed accumulation window
    all carried over."""
    from uniter_tpu.data.buckets import BucketSpec
    from uniter_tpu.data.loader import BucketLoader, MetaLoader

    spec = BucketSpec(txt_buckets=(8,), img_buckets=(8,),
                      token_budget=128, size_mul=8)

    def make_meta():
        return MetaLoader(
            {"mlm": (BucketLoader(_SkipDs(40), spec, seed=5, loop=True), 2),
             "itm": (BucketLoader(_SkipDs(24), spec, seed=9, loop=True), 1)},
            accum_steps=3, seed=77)

    full = _batches(make_meta(), 13)
    skipping = make_meta()
    skipping.skip_steps(7)  # mid-window: 7 % 3 != 0
    tail = _batches(skipping, 6)
    for (t_a, b_a), (t_b, b_b) in zip(full[7:], tail):
        assert t_a == t_b
        np.testing.assert_array_equal(b_a["idx"], b_b["idx"])
        np.testing.assert_array_equal(b_a["noise"], b_b["noise"])


def test_grouped_accum_skip_multi_bucket():
    """With AccumLoader's plan grouping, skip_batches(n_stacked * accum) on
    the base loader is exact even with multiple bucket shapes: every stack
    is a contiguous same-bucket run, so the resumed stream equals the
    uninterrupted stream from that position."""
    from uniter_tpu.data.buckets import BucketSpec
    from uniter_tpu.data.loader import AccumLoader, BucketLoader

    class TwoBucketDs(_SkipDs):
        def size_of(self, i):
            return (6, 5) if i % 2 == 0 else (13, 5)

    spec = BucketSpec(txt_buckets=(8, 16), img_buckets=(8,),
                      token_budget=128, size_mul=8)

    def make():
        return BucketLoader(TwoBucketDs(64), spec, seed=3, loop=True)

    base_a = make()
    full = _batches(AccumLoader(base_a, 2), 8)
    for b in full:  # every stack is shape-uniform by construction
        assert b["idx"].shape[0] == 2

    base_b = make()
    acc_b = AccumLoader(base_b, 2)
    base_b.skip_batches(2 * 2)  # TrainLoop's resume formula, start_step=2
    tail = _batches(acc_b, 6)
    for a, b in zip(full[2:], tail):
        np.testing.assert_array_equal(a["idx"], b["idx"])
        np.testing.assert_array_equal(a["noise"], b["noise"])


def test_hn_loader_skip_matches_stream():
    """HnLoader.skip_batches(k) == consume k batches: same example order and
    same per-record mining RNG, across the epoch reshuffle."""
    import train_itm_hard_negatives as hn

    class FakeHnDs:
        def __len__(self):
            return 10

        def get_record(self, i, rng):
            return {"i": np.full((2, 4), i), "r": rng.rand(2, 4)}

    orig = hn.hard_neg_collate
    hn.hard_neg_collate = lambda rec, t, r: rec
    try:
        a = hn.HnLoader(FakeHnDs(), 16, 8, seed=4)
        full = [next(a) for _ in range(14)]
        b = hn.HnLoader(FakeHnDs(), 16, 8, seed=4)
        b.skip_batches(12)
        tail = [next(b) for _ in range(2)]
        for x, y in zip(full[12:], tail):
            np.testing.assert_array_equal(x["i"], y["i"])
            np.testing.assert_array_equal(x["r"], y["r"])
    finally:
        hn.hard_neg_collate = orig


def test_grouped_partial_runs_carry_across_epochs():
    """A bucket with fewer than `group` batches per epoch must NOT be
    silently excluded: its partial run rolls into the next epoch and
    completes there (dropping it would permanently exclude those
    examples from accumulated training)."""
    from uniter_tpu.data.buckets import BucketSpec
    from uniter_tpu.data.loader import AccumLoader, BucketLoader

    class SkewDs(_SkipDs):
        # 8 long examples -> exactly 1 batch/epoch in the big bucket;
        # 32 short ones -> 4 batches/epoch in the small bucket
        def size_of(self, i):
            return (13, 5) if i < 8 else (6, 5)

    spec = BucketSpec(txt_buckets=(8, 16), img_buckets=(8,),
                      token_budget=128, size_mul=8)
    loader = BucketLoader(SkewDs(40), spec, seed=2, loop=True)
    acc = AccumLoader(loader, 2)

    long_seen = set()
    for b in _batches(acc, 24):  # ~4 epochs of plan
        ids = set(int(x) for x in b["idx"].ravel() if x >= 0)
        if ids and min(ids) < 8:
            assert all(x < 8 for x in ids), "stack mixed bucket shapes"
            long_seen |= ids
    assert long_seen == set(range(8)), long_seen


def test_distributed_sampler_partitions_every_epoch():
    """Reference-parity DistributedSampler: shards partition the padded id
    set each epoch, epoch changes reshuffle, equal per-shard lengths."""
    from uniter_tpu.data.sampler import DistributedSampler

    def shard_lists(epoch):
        out = []
        for p in range(3):
            s = DistributedSampler(10, shard_index=p, shard_count=3,
                                   shuffle=True, seed=4)
            s.set_epoch(epoch)
            out.append(list(s))
        return out

    parts = shard_lists(0)
    assert all(len(p) == 4 for p in parts)  # padded 12 / 3
    flat = [i for p in parts for i in p]
    assert set(flat) == set(range(10))  # every id covered
    assert shard_lists(1) != parts  # epoch reshuffles


def test_concat_dataset_attr_semantics():
    """ConcatDataset must behave like a dataset under the loader's probes:
    rows_per_example is a value (not a closure), absent attributes raise
    AttributeError (hasattr probes!), and method fan-out still works when
    every child has the method."""
    from uniter_tpu.data.buckets import BucketSpec
    from uniter_tpu.data.datasets import ConcatDataset
    from uniter_tpu.data.loader import BucketLoader

    class Child(_SkipDs):
        def __init__(self, n):
            super().__init__(n)
            self.lens = [11] * n
            self.epochs = 0

        def new_epoch(self, rng):
            self.epochs += 1

    a, b = Child(16), Child(24)
    cat = ConcatDataset([a, b])
    assert cat.rows_per_example == 1  # value, not a closure
    assert not hasattr(cat, "definitely_missing")
    cat.new_epoch(np.random.RandomState(0))  # fans out
    assert a.epochs == 1 and b.epochs == 1
    assert len(cat) == 40 and cat.size_of(17) == (6, 5)

    # end-to-end through the loader (multi-corpus pretraining shape)
    spec = BucketSpec(txt_buckets=(8,), img_buckets=(8,),
                      token_budget=128, size_mul=8)
    loader = BucketLoader(cat, spec, collate=_SkipDs.collate, seed=1,
                          loop=True)
    got = _batches(loader, 7)  # > one epoch: exercises new_epoch fan-out
    assert len(got) == 7 and a.epochs >= 2


def test_eval_loader_reiterates_identically():
    """loop=False loaders replay the SAME pass each time: same order, same
    per-record RNG, and the dataset's new_epoch is never invoked —
    validation metrics stay comparable across validation rounds."""
    from uniter_tpu.data.buckets import BucketSpec
    from uniter_tpu.data.loader import BucketLoader

    class EpochDs(_SkipDs):
        epochs = 0

        def new_epoch(self, rng):
            type(self).epochs += 1

    spec = BucketSpec(txt_buckets=(8,), img_buckets=(8,),
                      token_budget=128, size_mul=8)
    loader = BucketLoader(EpochDs(24), spec, seed=9, shuffle=False,
                          loop=False, drop_last=False)
    first = list(iter(loader))
    second = list(iter(loader))
    assert EpochDs.epochs == 0  # eval never mutates the dataset
    assert len(first) == len(second) > 0
    for x, y in zip(first, second):
        np.testing.assert_array_equal(x["idx"], y["idx"])
        np.testing.assert_array_equal(x["noise"], y["noise"])


def test_wire_codec_int8_roundtrip_and_training():
    """--wire_codec int8: device_put_batch ships img_feat as per-row
    int8+scale and dequantizes on device within max|row|/254 per element;
    a train step consumes the batch unchanged (VERDICT r2 weak #4 — the
    wire-bound-host option)."""
    import jax
    import jax.numpy as jnp

    from uniter_tpu.parallel.mesh import MeshConfig, make_mesh
    from uniter_tpu.training.loop import device_put_batch

    mesh = make_mesh(MeshConfig(data=8))
    rng = np.random.RandomState(0)
    batch = dict(
        input_ids=rng.randint(1, 100, (16, 6)).astype(np.int32),
        img_feat=rng.randn(16, 4, 32).astype(np.float32),
        img_pos_feat=rng.rand(16, 4, 7).astype(np.float32),
        qids=[f"q{i}" for i in range(16)],
    )
    out = device_put_batch(dict(batch), mesh, wire_codec="int8")
    feat = np.asarray(out["img_feat"])
    assert feat.dtype == np.float32
    tol = np.abs(batch["img_feat"]).max(-1, keepdims=True) / 254 + 1e-6
    assert (np.abs(feat - batch["img_feat"]) <= tol).all()
    # untouched fields pass through exactly
    np.testing.assert_array_equal(np.asarray(out["input_ids"]),
                                  batch["input_ids"])
    np.testing.assert_array_equal(np.asarray(out["img_pos_feat"]),
                                  batch["img_pos_feat"])
    assert out["qids"] == batch["qids"]
    # with a transfer dtype the dequant lands in that dtype
    out16 = device_put_batch(dict(batch), mesh, wire_codec="int8",
                             transfer_dtype=jnp.bfloat16)
    assert np.asarray(out16["img_feat"]).dtype == jnp.bfloat16
    # fp16 feature sources (r4 default collate dtype): the int8 codec must
    # still fire, and the plain path ships fp16 AS-IS (a host bf16 cast
    # would add work without shrinking the 2-byte wire)
    b16 = dict(batch, img_feat=batch["img_feat"].astype(np.float16))
    o_q = device_put_batch(dict(b16), mesh, wire_codec="int8",
                           transfer_dtype=jnp.bfloat16)
    assert np.asarray(o_q["img_feat"]).dtype == jnp.bfloat16
    tol16 = np.abs(b16["img_feat"]).max(-1, keepdims=True) / 127 + 1e-2
    assert (np.abs(np.asarray(o_q["img_feat"], np.float32)
                   - b16["img_feat"].astype(np.float32)) <= tol16).all()
    o_p = device_put_batch(dict(b16), mesh, transfer_dtype=jnp.bfloat16)
    assert np.asarray(o_p["img_feat"]).dtype == np.float16
    # accum layout: [k, B, ...] quantizes along the last axis the same way
    stacked = {k: np.broadcast_to(v, (2,) + v.shape).copy()
               for k, v in batch.items() if isinstance(v, np.ndarray)}
    outa = device_put_batch(stacked, mesh, accum=True, wire_codec="int8")
    np.testing.assert_allclose(np.asarray(outa["img_feat"])[0], feat,
                               rtol=0, atol=0)

    # the dequantized batch drives a jitted computation with sharded inputs
    def loss(b):
        return jnp.sum(b["img_feat"] * 0.0) + jnp.sum(
            b["input_ids"].astype(jnp.float32))

    val = jax.jit(loss)({k: v for k, v in out.items() if k != "qids"})
    assert np.isfinite(float(val))
