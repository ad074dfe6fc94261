"""Golden-fingerprint tests for collates.

Batch dicts are pure functions of records (SURVEY §4), so their contents are
fingerprinted and pinned. Any change to padding, slot derivation, or field
layout shows up as a fingerprint diff — regenerate intentionally with
UPDATE_COLLATE_GOLDEN=1 python -m pytest tests/test_collate_golden.py
"""

import hashlib
import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_collates.json")


def fingerprint(batch):
    out = {}
    for k in sorted(batch):
        v = batch[k]
        if isinstance(v, np.ndarray):
            h = hashlib.sha256(
                np.ascontiguousarray(v).tobytes()
                + str(v.dtype).encode() + str(v.shape).encode()
            ).hexdigest()[:16]
            out[k] = f"{v.dtype}{list(v.shape)}:{h}"
        elif isinstance(v, (int, float, str)):
            out[k] = v
        elif isinstance(v, list):
            out[k] = f"list[{len(v)}]"
    return out


def make_records(n, t, r, seed, extra):
    rng = np.random.RandomState(seed)
    recs = []
    for i in range(n):
        tl = rng.randint(3, t)
        nbb = rng.randint(2, r)
        rec = dict(
            input_ids=rng.randint(100, 400, tl).astype(np.int32),
            img_feat=rng.randn(nbb, 16).astype(np.float32),
            img_pos_feat=rng.rand(nbb, 7).astype(np.float32),
        )
        rec.update(extra(rng, tl, nbb, i))
        recs.append(rec)
    return recs


def build_all():
    from uniter_tpu.data.buckets import collate_joint
    from uniter_tpu.data.mlm import MlmDataset
    from uniter_tpu.data.mrm import MrfrDataset
    from uniter_tpu.data.vqa import VqaDataset
    from uniter_tpu.data.itm import ItmDataset

    cases = {}
    cases["joint"] = collate_joint(
        make_records(3, 12, 8, 0, lambda rng, tl, nbb, i: {}), 16, 8, 4)
    cases["mlm"] = MlmDataset.collate(
        make_records(3, 12, 8, 1, lambda rng, tl, nbb, i: dict(
            txt_labels=np.where(rng.rand(tl) < 0.3,
                                rng.randint(100, 400, tl), -1
                                ).astype(np.int32))),
        16, 8, 4)
    cases["mrfr"] = MrfrDataset.collate(
        make_records(3, 12, 8, 2, lambda rng, tl, nbb, i: dict(
            img_masks=(rng.rand(nbb) < 0.4),
            feat_target_full=rng.randn(nbb, 16).astype(np.float32))),
        16, 8, 4)
    cases["vqa"] = VqaDataset.collate(
        make_records(3, 12, 8, 3, lambda rng, tl, nbb, i: dict(
            target=rng.rand(7).astype(np.float32), qid=f"q{i}")),
        16, 8, 4)
    cases["itm"] = ItmDataset.collate(
        make_records(3, 12, 8, 4, lambda rng, tl, nbb, i: dict(
            target=int(i % 2))),
        16, 8, 4)
    return {name: fingerprint(b) for name, b in cases.items()}


def test_collate_fingerprints():
    got = build_all()
    if os.environ.get("UPDATE_COLLATE_GOLDEN") or not os.path.exists(GOLDEN):
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=2, sort_keys=True)
        pytest.skip("golden fingerprints (re)generated")
    with open(GOLDEN) as f:
        want = json.load(f)
    assert got == want
