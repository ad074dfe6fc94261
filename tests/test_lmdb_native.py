"""Native lmdbx engine tests: round-trip (incl. overflow values and
multi-level B+trees), ordered key iteration, and the txt_db/img_db stack
running on LMDB storage (open_store sniffing)."""

import os

import numpy as np
import pytest

from uniter_tpu.data.lmdb_native import LmdbStore, write_lmdb
from uniter_tpu.data.store import open_store


def test_roundtrip_small(tmp_path):
    db = str(tmp_path / "db")
    records = {f"key_{i:04d}": f"value-{i}".encode() for i in range(100)}
    write_lmdb(db, records)
    assert os.path.exists(os.path.join(db, "data.mdb"))
    store = LmdbStore(db)
    assert len(store) == 100
    for k, v in records.items():
        assert store.get(k) == v, k
    assert store.get("nonexistent") is None
    assert list(store.keys()) == sorted(records)
    store.close()


def test_roundtrip_overflow_and_deep_tree(tmp_path):
    rng = np.random.RandomState(0)
    db = str(tmp_path / "db")
    records = {}
    # enough entries for >=2 branch levels + large values hitting overflow
    for i in range(5000):
        size = int(rng.choice([10, 500, 2000, 9000, 40000],
                              p=[0.5, 0.2, 0.15, 0.1, 0.05]))
        records[f"coco_{i:012d}.npz"] = rng.bytes(size)
    write_lmdb(db, records)
    store = LmdbStore(db)
    assert len(store) == 5000
    for k in list(records)[::97] + list(records)[-3:]:
        assert store.get(k) == records[k], k
    assert list(store.keys()) == sorted(records)
    store.close()


def test_open_store_sniffs_lmdb(tmp_path):
    db = str(tmp_path / "db")
    write_lmdb(db, {"a": b"1", "b": b"2"})
    store = open_store(db)
    assert isinstance(store, LmdbStore)
    assert store["a"] == b"1"
    store.close()


def test_txt_db_on_lmdb(tmp_path):
    """The full txt_db stack (lz4+msgpack records) over native LMDB."""
    import json

    from uniter_tpu.data import lz4f
    from uniter_tpu.data import msgpack_numpy as msgnp
    from uniter_tpu.data.txt_db import TxtTokDb

    db_dir = str(tmp_path / "txt")
    records, id2len = {}, {}
    for i in range(20):
        rec = {"input_ids": list(range(110, 110 + 4 + i % 5)),
               "img_fname": f"img_{i}.npz"}
        records[f"t{i}"] = lz4f.compress(msgnp.packb(rec))
        id2len[f"t{i}"] = len(rec["input_ids"])
    write_lmdb(db_dir, records)
    with open(os.path.join(db_dir, "meta.json"), "w") as f:
        json.dump({"CLS": 101, "SEP": 102, "MASK": 103,
                   "v_range": [104, 300]}, f)
    with open(os.path.join(db_dir, "id2len.json"), "w") as f:
        json.dump(id2len, f)
    with open(os.path.join(db_dir, "txt2img.json"), "w") as f:
        json.dump({f"t{i}": f"img_{i}.npz" for i in range(20)}, f)

    db = TxtTokDb(db_dir, max_txt_len=60)
    rec = db["t3"]
    assert rec["input_ids"] == list(range(110, 117))
    ids = db.combine_inputs(rec["input_ids"])
    assert ids[0] == 101 and ids[-1] == 102


def test_img_db_on_lmdb(tmp_path):
    import io
    import json

    from uniter_tpu.data.img_db import DetectFeatDb

    rng = np.random.RandomState(0)
    img_dir = str(tmp_path / "img")
    db_name = "feat_th0.2_max10_min3_compressed"
    records, name2nbb = {}, {}
    for i in range(5):
        n = f"coco_{i:06d}.npz"
        nbb = rng.randint(4, 9)
        buf = io.BytesIO()
        np.savez(
            buf,
            features=rng.randn(nbb, 64).astype(np.float16),
            norm_bb=rng.rand(nbb, 6).astype(np.float16),
            conf=np.linspace(1, 0.3, nbb).astype(np.float16),
            soft_labels=rng.rand(nbb, 17).astype(np.float16),
        )
        records[n] = buf.getvalue()
        name2nbb[n] = nbb
    write_lmdb(os.path.join(img_dir, db_name), records)
    with open(os.path.join(img_dir, "nbb_th0.2_max10_min3.json"), "w") as f:
        json.dump(name2nbb, f)

    db = DetectFeatDb(img_dir, conf_th=0.2, max_bb=10, min_bb=3)
    feat, pos7, nbb = db.get_img_feat("coco_000002.npz")
    assert feat.shape == (name2nbb["coco_000002.npz"], 64)
    assert pos7.shape[1] == 7


def test_writer_rejects_oversized_keys(tmp_path):
    """LMDB's maxkeysize is 511 bytes; the bulk writer must reject larger
    keys instead of corrupting the page math / emitting a data.mdb stock
    liblmdb readers refuse."""
    import pytest

    from uniter_tpu.data.lmdb_native import write_lmdb

    with pytest.raises(ValueError, match="maxkeysize"):
        write_lmdb(str(tmp_path / "db"), {"k" * 600: b"v"})
    # boundary: 511 is fine
    write_lmdb(str(tmp_path / "db2"), {"k" * 511: b"v", "a": b"b"})


def test_streaming_writer_multi_leaf_and_overflow(tmp_path):
    """The STREAMING builder (leaves + overflow pages hit disk as they
    fill; branches + metas back-patched at finish) round-trips a DB far
    larger than one leaf, with values spanning inline, single-overflow,
    and multi-page-overflow sizes, via an ITERATOR-style sorted feed."""
    import numpy as np

    from uniter_tpu.data.lmdb_native import LmdbStore, LmdbWriter

    rng = np.random.RandomState(0)
    vals = {}
    with LmdbWriter(str(tmp_path / "db")) as w:
        for i in range(3000):  # many leaves; ~mixed value sizes
            k = f"k{i:08d}"
            n = (3, 900, 9000)[i % 3]  # inline / 1-page ov / 3-page ov
            v = rng.bytes(n)
            vals[k] = v
            w.put(k, v)
    db = LmdbStore(str(tmp_path / "db"))
    assert len(db) == 3000
    for i in (0, 1, 2, 1499, 2998, 2999):
        k = f"k{i:08d}"
        assert db.get(k) == vals[k], k
    assert db.get("missing") is None
    # cursor enumerates every key in sorted order
    keys = list(db.keys())
    assert keys == sorted(vals)
    db.close()


def test_streaming_writer_rejects_unsorted(tmp_path):
    import pytest

    from uniter_tpu.data.lmdb_native import LmdbWriter

    w = LmdbWriter(str(tmp_path / "db"))
    w.put("b", b"1")
    with pytest.raises(ValueError, match="sorted"):
        w.put("a", b"2")
    assert not (tmp_path / "db" / "data.mdb").exists()  # aborted + removed


def test_streaming_writer_abort_removes_partial(tmp_path):
    from uniter_tpu.data.lmdb_native import LmdbWriter

    try:
        with LmdbWriter(str(tmp_path / "db")) as w:
            w.put("a", b"1")
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not (tmp_path / "db" / "data.mdb").exists()
