"""Data-plane tests: DB round-trips, bucketing, task loaders, and a batch
flowing into the models (end-to-end slice on synthetic DBs)."""

import numpy as np
import pytest

from uniter_tpu.data import (
    DetectFeatDb, TxtTokDb, write_img_db, write_txt_db,
)
from uniter_tpu.data.buckets import BucketSpec
from uniter_tpu.data.datasets import ConcatDataset
from uniter_tpu.data.itm import ItmDataset, ItmEvalDataset
from uniter_tpu.data.loader import BucketLoader, MetaLoader
from uniter_tpu.data.mlm import MlmDataset
from uniter_tpu.data.mrm import MrcDataset, MrfrDataset
from uniter_tpu.data.nlvr2 import Nlvr2PairedDataset
from uniter_tpu.data.vqa import VqaDataset

VOCAB = 500
IMG_DIM = 32
LABEL_DIM = 17
META = {"CLS": 101, "SEP": 102, "MASK": 103, "v_range": [104, VOCAB]}


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    root = tmp_path_factory.mktemp("dbs")
    rng = np.random.RandomState(0)
    n_img, n_txt = 12, 30
    img_names = [f"coco_{i:06d}.npz" for i in range(n_img)]
    img_records = {}
    for name in img_names:
        nbb = rng.randint(6, 16)
        bb = rng.rand(nbb, 6).astype(np.float16)
        img_records[name] = dict(
            features=rng.randn(nbb, IMG_DIM).astype(np.float16),
            norm_bb=bb,
            conf=np.linspace(1, 0.05, nbb).astype(np.float16),
            soft_labels=rng.rand(nbb, LABEL_DIM).astype(np.float16),
        )
    img_dir = str(root / "img")
    write_img_db(img_dir, img_records, conf_th=0.2, max_bb=14, min_bb=4)

    txt_records, txt2img = {}, {}
    for i in range(n_txt):
        tid = f"txt_{i}"
        L = rng.randint(4, 14)
        txt_records[tid] = dict(
            input_ids=[int(x) for x in rng.randint(110, VOCAB, L)],
            img_fname=img_names[i % n_img],
            target={"labels": [int(rng.randint(0, 10))], "scores": [1.0]},
        )
        txt2img[tid] = img_names[i % n_img]
    txt_dir = str(root / "txt")
    write_txt_db(txt_dir, txt_records, META, txt2img)

    # NLVR2-style txt db (img_fname is a pair, integer target)
    nlvr_records, nlvr_t2i = {}, {}
    for i in range(10):
        tid = f"nlvr2_{i}"
        L = rng.randint(4, 12)
        nlvr_records[tid] = dict(
            input_ids=[int(x) for x in rng.randint(110, VOCAB, L)],
            img_fname=[img_names[2 * (i % 6)], img_names[2 * (i % 6) + 1]],
            target=int(rng.randint(0, 2)),
        )
        nlvr_t2i[tid] = nlvr_records[tid]["img_fname"]
    nlvr_dir = str(root / "nlvr_txt")
    write_txt_db(nlvr_dir, nlvr_records, META, nlvr_t2i)

    return dict(img_dir=img_dir, txt_dir=txt_dir, nlvr_dir=nlvr_dir)


def open_dbs(dbs):
    txt_db = TxtTokDb(dbs["txt_dir"], max_txt_len=60)
    img_db = DetectFeatDb(dbs["img_dir"], conf_th=0.2, max_bb=14, min_bb=4)
    return txt_db, img_db


def test_db_roundtrip(dbs):
    txt_db, img_db = open_dbs(dbs)
    assert len(txt_db.id2len) == 30
    rec = txt_db["txt_0"]
    assert "input_ids" in rec and "img_fname" in rec
    feat, pos7, nbb = img_db.get_img_feat(rec["img_fname"])
    assert feat.shape[1] == IMG_DIM and pos7.shape[1] == 7
    assert 4 <= nbb <= 14
    np.testing.assert_allclose(pos7[:, 6], pos7[:, 4] * pos7[:, 5], rtol=1e-3)
    dump = img_db.get_dump(rec["img_fname"])
    assert dump["soft_labels"].shape == (nbb, LABEL_DIM)
    assert dump["features"].dtype == np.float32


def test_compress_flag_mismatch(dbs, tmp_path):
    """Records decode regardless of the --compressed_db flag: format is
    sniffed from the bytes, and a missing store name falls back to the
    opposite compression variant."""
    rng = np.random.RandomState(1)
    recs = {"x.npz": dict(features=rng.randn(5, IMG_DIM).astype(np.float16),
                          norm_bb=rng.rand(5, 6).astype(np.float16),
                          conf=np.linspace(1, 0.3, 5).astype(np.float16),
                          soft_labels=rng.rand(5, LABEL_DIM).astype(np.float16))}
    for compress in (True, False):
        d = str(tmp_path / f"img_{compress}")
        write_img_db(d, recs, conf_th=0.2, max_bb=14, min_bb=4,
                     compress=compress)
        for open_compress in (True, False):
            db = DetectFeatDb(d, conf_th=0.2, max_bb=14, min_bb=4,
                              compress=open_compress)
            feat, pos7, nbb = db.get_img_feat("x.npz")
            assert feat.shape == (5, IMG_DIM) and nbb == 5


def test_mlm_loader(dbs):
    txt_db, img_db = open_dbs(dbs)
    spec = BucketSpec((16, 32), (8, 16), token_budget=128, min_batch=4)
    ds = MlmDataset(txt_db, img_db)
    loader = BucketLoader(ds, spec, seed=1)
    batches = list(loader)
    assert sum(int(b["ex_weight"].sum()) for b in batches) == 30
    b = batches[0]
    assert b["input_ids"].shape[1] in (16, 32)
    assert (b["mlm_tgt"] != -1).sum() > 0  # at least one masked position
    # masked slots index real txt positions
    rows = np.nonzero(b["ex_weight"])[0]
    assert (b["mlm_pos"][rows] < b["txt_lens"][rows, None]).all()


def test_mrfr_mrc_loaders(dbs):
    txt_db, img_db = open_dbs(dbs)
    spec = BucketSpec((16,), (16,), token_budget=128, min_batch=4)
    for cls, key in ((MrfrDataset, "feat_targets"), (MrcDataset,
                                                     "label_targets")):
        ds = cls(0.15, txt_db, img_db)
        b = next(iter(BucketLoader(ds, spec, seed=2)))
        assert b[key].shape[1] == b["mrm_pos"].shape[1]
        assert b["mrm_valid"].sum() > 0
        # masked input features are zeroed at masked positions
        masked = b["img_masks"].astype(bool)
        assert np.abs(b["img_feat"][masked]).sum() == 0


def test_vqa_loader_and_model(dbs):
    import jax
    import jax.numpy as jnp
    from uniter_tpu.config import tiny_config
    from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering

    txt_db, img_db = open_dbs(dbs)
    spec = BucketSpec((16,), (16,), token_budget=256, min_batch=4)
    ds = VqaDataset(11, txt_db, img_db)
    b = next(iter(BucketLoader(ds, spec, seed=3)))

    model = UniterForVisualQuestionAnswering(
        tiny_config(), img_dim=IMG_DIM, num_answer=11)
    jb = {k: jnp.asarray(v) for k, v in b.items()
          if isinstance(v, np.ndarray)}
    params = model.init({"params": jax.random.PRNGKey(0)}, jb, False)[
        "params"]
    loss = model.apply({"params": params}, jb, True, deterministic=True)
    assert np.isfinite(np.asarray(loss)).all()


def test_nlvr2_paired_loader(dbs):
    txt_db = TxtTokDb(dbs["nlvr_dir"], max_txt_len=60)
    img_db = DetectFeatDb(dbs["img_dir"], conf_th=0.2, max_bb=14, min_bb=4)
    spec = BucketSpec((16,), (16,), token_budget=256, min_batch=4)
    ds = Nlvr2PairedDataset(txt_db, img_db, use_img_type=True)
    b = next(iter(BucketLoader(ds, spec, seed=4)))
    # paired: 2 rows per example
    assert b["input_ids"].shape[0] == 2 * b["targets"].shape[0]
    rows = np.nonzero(b["attn_mask"][:, 16:].sum(1))[0]
    assert set(np.unique(b["img_type_ids"][rows])) <= {0, 1, 2}


def test_itm_new_epoch_and_eval(dbs):
    txt_db, img_db = open_dbs(dbs)
    ds = ItmDataset(txt_db, img_db, neg_sample_p=0.5)
    labels0 = ds.labels.copy()
    ds.new_epoch(np.random.RandomState(7))
    assert (labels0 != ds.labels).any()
    # negatives get a different image than ground truth
    for i in range(len(ds)):
        if ds.labels[i] == 0:
            assert ds.train_imgs[i] != ds.img_fnames[i]

    ev = ItmEvalDataset(txt_db, img_db, mini_batch_size=5)
    batches = ev.get_batches(0, 16, 16)
    assert sum(b["input_ids"].shape[0] for b in batches) >= 12
    nbbs = [img_db.name2nbb[f] for f in ev.all_img_ids]
    assert nbbs == sorted(nbbs)  # nbb-sorted for batching efficiency


def test_meta_loader_mixing(dbs):
    txt_db, img_db = open_dbs(dbs)
    spec = BucketSpec((16, 32), (16,), token_budget=128, min_batch=4)
    mlm = BucketLoader(MlmDataset(txt_db, img_db), spec, seed=1, loop=True)
    mrfr = BucketLoader(MrfrDataset(0.15, txt_db, img_db), spec, seed=2,
                        loop=True)
    meta = MetaLoader({"mlm": (mlm, 2), "mrfr": (mrfr, 1)}, accum_steps=1,
                      seed=0)
    names = [name for name, _ in zip(
        (n for n, _ in iter(meta)), range(60))]
    frac = names.count("mlm") / len(names)
    assert 0.45 < frac < 0.85  # ~2/3 expected


def test_concat_dataset(dbs):
    txt_db, img_db = open_dbs(dbs)
    a = MlmDataset(txt_db, img_db)
    b = MlmDataset(txt_db, img_db)
    c = ConcatDataset([a, b])
    assert len(c) == 60
    assert c.size_of(35) == b.size_of(5)
    rec = c.get_record(59, np.random.RandomState(0))
    assert "input_ids" in rec


def test_bucket_stats_accounting():
    """bucket_stats: exact token accounting on a hand-computed case."""
    from uniter_tpu.data.buckets import BucketSpec, bucket_stats

    spec = BucketSpec(txt_buckets=(16, 32), img_buckets=(8,),
                      token_budget=96, size_mul=2, min_batch=2)
    # bucket (16, 8): batch rows = 96 // 24 = 4
    # bucket (32, 8): batch rows = 96 // 40 = 2
    sizes = [(10, 5)] * 5 + [(20, 8)] * 2
    st = bucket_stats(sizes, spec)
    b1 = st["buckets"]["16x8"]
    assert b1["examples"] == 5 and b1["batches"] == 2
    assert b1["token_efficiency"] == round(5 * 15 / (2 * 4 * 24), 4)
    b2 = st["buckets"]["32x8"]
    assert b2["examples"] == 2 and b2["batches"] == 1
    assert st["n_programs"] == 2 and st["n_batches"] == 3
    total_eff = (5 * 15 + 2 * 28) / (2 * 4 * 24 + 1 * 2 * 40)
    assert st["token_efficiency"] == round(total_eff, 4)
