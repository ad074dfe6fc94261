"""Data-layer parity vs the reference implementation's own collate
functions (VERDICT r2 missing #2).

The reference collates are pure functions over per-example tensors; they are
imported here with the same stubbing approach as test_reference_parity
(horovod/lmdb/lz4/msgpack_numpy/cytoolz never execute inside the collates).
Identical synthetic records are fed to both sides and every field is
compared semantically, modulo the documented layout change:

  reference: ragged rows padded to the batch max, image positions packed
             directly after each row's text via ``gather_index``
             (data/data.py:271-279), OT needing an explicit ``ot_scatter``
  rebuild:   static (T, R) buckets, text in [0, T), image in [T, T+R),
             ``attn_mask`` prefix-valid per segment, ex_weight padding rows,
             masked-slot (pos, tgt) pairs instead of dense label tensors

Covered: mlm (collate + random_word masking semantics), mrfr, mrc, itm+ot
(ot_scatter/pad geometry), nlvr2 paired + triplet, vqa, vcr qa/qar row
construction + collate, re (reference data/mlm.py:96-136, mrm.py:75-200,
itm.py:99-185, nlvr2.py:61-96/168-200, vqa.py:44-72, vcr.py:102-196,
re.py:126-174).
"""

import itertools
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference not mounted")

torch = pytest.importorskip("torch")

# shared synthetic geometry
CLS, SEP, MASK = 101, 102, 103
V_RANGE = (104, 140)
B = 4
RAW = [7, 3, 5, 2]          # raw token counts (no CLS/SEP)
TL = [n + 2 for n in RAW]   # combined lengths
NBB = [7, 3, 5, 6]
D = 16                      # feature dim
T, R = 12, 8                # our static bucket
PAD_ROWS = 2                # extra zero-weight rows our collate pads


def _stub(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


@pytest.fixture(scope="module")
def refdata(tmp_path_factory):
    """Import the reference data package with its native/dist deps stubbed
    (the collate functions themselves touch none of them)."""
    hvd = _stub("horovod")
    hvd.torch = _stub("horovod.torch", rank=lambda: 0, size=lambda: 1,
                      local_size=lambda: 1)
    _stub("lmdb", open=None)
    lz4 = _stub("lz4")
    lz4.frame = _stub("lz4.frame", compress=lambda x: x,
                      decompress=lambda x: x)
    _stub("msgpack_numpy", patch=lambda: None)
    def _partition_all(n, seq):
        it = iter(seq)
        while True:
            chunk = tuple(itertools.islice(it, n))
            if not chunk:
                return
            yield chunk

    _stub("cytoolz", concat=itertools.chain.from_iterable,
          partition_all=_partition_all)
    try:
        import tqdm  # noqa: F401
    except ImportError:
        _stub("tqdm", tqdm=lambda x, **kw: x)

    root = tmp_path_factory.mktemp("refdatasrc")
    pkg = root / "refdata"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    for f in ("data.py", "sampler.py", "mlm.py", "mrm.py", "itm.py",
              "nlvr2.py", "vqa.py", "vcr.py", "re.py", "ve.py"):
        os.symlink(f"{REF}/{f}", pkg / f)
    sys.path.insert(0, str(root))
    import importlib

    mods = {
        name: importlib.import_module(f"refdata.{name}")
        for name in ("data", "mlm", "mrm", "itm", "nlvr2", "vqa", "vcr",
                     "re")
    }
    yield types.SimpleNamespace(**mods)
    sys.path.remove(str(root))


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def make_rows(seed=0, raw=RAW, nbb=NBB):
    rng = np.random.RandomState(seed)
    toks = [rng.randint(*V_RANGE, size=n).astype(np.int64).tolist()
            for n in raw]
    feats = [rng.randn(n, D).astype(np.float32) for n in nbb]
    pos7 = [rng.rand(n, 7).astype(np.float32) for n in nbb]
    return toks, feats, pos7


def check_core(ours, ref, tls, nbs, t_bucket=T, r_bucket=R,
               check_weight=True):
    """Joint-core field parity: valid regions equal, our padding zero, the
    reference's gather_index obeys its documented contract (the geometry our
    static layout replaces)."""
    n = len(tls)
    r_ids = _np(ref["input_ids"])
    r_feat = _np(ref["img_feat"])
    r_pos7 = _np(ref["img_pos_feat"])
    r_attn = _np(ref["attn_masks"])
    max_tl = r_ids.shape[1]
    for i in range(n):
        tl, nb = tls[i], nbs[i]
        np.testing.assert_array_equal(ours["input_ids"][i, :tl],
                                      r_ids[i, :tl])
        assert (ours["input_ids"][i, tl:] == 0).all()
        np.testing.assert_array_equal(ours["img_feat"][i, :nb],
                                      r_feat[i, :nb])
        assert (ours["img_feat"][i, nb:] == 0).all()
        np.testing.assert_array_equal(ours["img_pos_feat"][i, :nb],
                                      r_pos7[i, :nb])
        # reference row: ones(tl+nb) then pad; ours: per-segment prefixes
        assert r_attn[i].sum() == tl + nb
        oa = ours["attn_mask"][i]
        np.testing.assert_array_equal(
            oa[:t_bucket], (np.arange(t_bucket) < tl).astype(oa.dtype))
        np.testing.assert_array_equal(
            oa[t_bucket:t_bucket + r_bucket],
            (np.arange(r_bucket) < nb).astype(oa.dtype))
        assert ours["txt_lens"][i] == tl and ours["num_bbs"][i] == nb
    if check_weight:
        w = ours["ex_weight"]
        assert (w[:n] == 1).all() and (w[n:] == 0).all()
        assert (ours["attn_mask"][n:] == 0).all()
    # reference gather_index contract (data/data.py:271-279): row i reads
    # txt positions [0, tl) then img positions [max_tl, max_tl+nb)
    gi = _np(ref["gather_index"])
    for i in range(n):
        tl, nb = tls[i], nbs[i]
        np.testing.assert_array_equal(gi[i, :tl], np.arange(tl))
        np.testing.assert_array_equal(gi[i, tl:tl + nb],
                                      np.arange(max_tl, max_tl + nb))
    np.testing.assert_array_equal(_np(ref["position_ids"])[0],
                                  np.arange(max_tl))
    np.testing.assert_array_equal(ours["position_ids"][0],
                                  np.arange(t_bucket))


# --- MLM --------------------------------------------------------------------


def _mlm_inputs():
    """Deterministic post-masking records (masking itself is compared in
    test_random_word_semantics): first raw token masked, its label kept."""
    toks, feats, pos7 = make_rows(1)
    masked, labels = [], []
    for tk in toks:
        m = list(tk)
        lab = [-1] * len(m)
        lab[0] = m[0]
        m[0] = MASK
        masked.append([CLS] + m + [SEP])
        labels.append([-1] + lab + [-1])
    return masked, labels, feats, pos7


def test_mlm_collate(refdata):
    from uniter_tpu.data.mlm import MlmDataset

    masked, labels, feats, pos7 = _mlm_inputs()
    ref_inputs = [
        (torch.tensor(masked[i]), torch.tensor(feats[i]),
         torch.tensor(pos7[i]),
         torch.ones(TL[i] + NBB[i], dtype=torch.long),
         torch.tensor(labels[i]))
        for i in range(B)
    ]
    ref = refdata.mlm.mlm_collate(ref_inputs)

    records = [dict(input_ids=np.asarray(masked[i], np.int32),
                    img_feat=feats[i], img_pos_feat=pos7[i],
                    txt_labels=np.asarray(labels[i], np.int32))
               for i in range(B)]
    ours = MlmDataset.collate(records, T, R, B + PAD_ROWS)

    check_core(ours, ref, TL, NBB)
    # (mlm_pos, mlm_tgt) slots reconstruct the reference's dense txt_labels
    dense = np.full((B, T), -1, np.int64)
    for i in range(B):
        for s in range(ours["mlm_pos"].shape[1]):
            if ours["mlm_tgt"][i, s] != -1:
                dense[i, ours["mlm_pos"][i, s]] = ours["mlm_tgt"][i, s]
    ref_lab = _np(ref["txt_labels"])
    for i in range(B):
        np.testing.assert_array_equal(dense[i, :TL[i]], ref_lab[i, :TL[i]])
        assert (dense[i, TL[i]:] == -1).all()
    # our padding rows carry no targets
    assert (ours["mlm_tgt"][B:] == -1).all()


class _ScriptRng:
    """Drives our random_word with a prescribed decision sequence."""

    def __init__(self, probs, rint):
        self.probs = list(probs)
        self.rint = rint

    def random_sample(self):
        return self.probs.pop(0)

    def randint(self, lo, hi):
        assert (lo, hi) == V_RANGE
        return self.rint

    def choice(self, n):  # pragma: no cover - not used by random_word
        raise AssertionError


def test_random_word_semantics(refdata, monkeypatch):
    """Masking decisions (15% select; 80/10/10 mask/random/keep; at least
    one masked) match the reference's random_word (data/mlm.py:17-54) when
    both draw the same uniforms."""
    from uniter_tpu.data.mlm import random_word as our_random_word

    tokens = [110, 111, 112, 113, 114]
    rint = 125
    # mask, unselected, random-replace, selected-kept, unselected
    probs = [0.05, 0.5, 0.13, 0.149, 0.9]

    seq = list(probs)
    monkeypatch.setattr(
        refdata.mlm, "random",
        types.SimpleNamespace(random=lambda: seq.pop(0),
                              choice=lambda pool: rint))
    ref_toks, ref_labels = refdata.mlm.random_word(
        list(tokens), V_RANGE, MASK)
    our_toks, our_labels = our_random_word(
        tokens, V_RANGE, MASK, _ScriptRng(probs, rint))
    assert list(our_toks) == list(ref_toks)
    assert list(our_labels) == list(ref_labels)

    # nothing selected -> both force-mask position 0
    probs2 = [0.9] * len(tokens)
    seq2 = list(probs2)
    monkeypatch.setattr(
        refdata.mlm, "random",
        types.SimpleNamespace(random=lambda: seq2.pop(0),
                              choice=lambda pool: rint))
    ref_toks, ref_labels = refdata.mlm.random_word(
        list(tokens), V_RANGE, MASK)
    our_toks, our_labels = our_random_word(
        tokens, V_RANGE, MASK, _ScriptRng(probs2, rint))
    assert list(our_toks) == list(ref_toks) and ref_toks[0] == MASK
    assert list(our_labels) == list(ref_labels)


# --- MRFR / MRC -------------------------------------------------------------


def _region_masks():
    """Deterministic per-example region masks: first and last region."""
    masks = []
    for nb in NBB:
        m = np.zeros(nb, bool)
        m[0] = True
        m[nb - 1] = True
        masks.append(m)
    return masks


def test_mrfr_collate(refdata):
    from uniter_tpu.data.mrm import MrfrDataset

    toks, feats, pos7 = make_rows(2)
    ids = [[CLS] + tk + [SEP] for tk in toks]
    masks = _region_masks()
    ref_inputs = [
        (torch.tensor(ids[i]), torch.tensor(feats[i]),
         torch.tensor(pos7[i]),
         torch.ones(TL[i] + NBB[i], dtype=torch.long),
         torch.tensor(masks[i]),
         torch.cat([torch.zeros(TL[i], dtype=torch.uint8),
                    torch.tensor(masks[i].astype(np.uint8))]))
        for i in range(B)
    ]
    ref = refdata.mrm.mrfr_collate(ref_inputs)

    records = [dict(input_ids=np.asarray(ids[i], np.int32),
                    img_feat=np.where(masks[i][:, None], 0.0,
                                      feats[i]).astype(np.float32),
                    img_pos_feat=pos7[i], img_masks=masks[i],
                    feat_target_full=feats[i])
               for i in range(B)]
    ours = MrfrDataset.collate(records, T, R, B + PAD_ROWS)

    # masked positions are zero-filled on both sides -> core compares equal
    check_core(ours, ref, TL, NBB)
    ref_ft = _np(ref["feat_targets"])  # [sum(masked), D] in row order
    k = 0
    for i in range(B):
        cnt = int(masks[i].sum())
        np.testing.assert_array_equal(ours["feat_targets"][i, :cnt],
                                      ref_ft[k:k + cnt])
        k += cnt
        assert (ours["mrm_valid"][i, :cnt] == 1).all()
        assert (ours["mrm_valid"][i, cnt:] == 0).all()
        np.testing.assert_array_equal(ours["mrm_pos"][i, :cnt],
                                      np.nonzero(masks[i])[0])
        # dense mask fields agree
        np.testing.assert_array_equal(ours["img_masks"][i, :NBB[i]],
                                      _np(ref["img_masks"])[i, :NBB[i]])
        # reference img_mask_tgt is the joint-layout mask: txt zeros then
        # the region mask
        rt = _np(ref["img_mask_tgt"])[i]
        assert (rt[:TL[i]] == 0).all()
        np.testing.assert_array_equal(rt[TL[i]:TL[i] + NBB[i]],
                                      masks[i].astype(rt.dtype))
    assert k == ref_ft.shape[0]


def test_mrc_collate(refdata):
    from uniter_tpu.data.mrm import MrcDataset

    toks, feats, pos7 = make_rows(3)
    ids = [[CLS] + tk + [SEP] for tk in toks]
    masks = _region_masks()
    n_label = 5
    rng = np.random.RandomState(7)
    softs = [rng.rand(nb, n_label).astype(np.float32) for nb in NBB]
    ref_inputs = [
        (torch.tensor(ids[i]), torch.tensor(feats[i]),
         torch.tensor(pos7[i]), torch.tensor(softs[i]),
         torch.ones(TL[i] + NBB[i], dtype=torch.long),
         torch.tensor(masks[i]),
         torch.cat([torch.zeros(TL[i], dtype=torch.uint8),
                    torch.tensor(masks[i].astype(np.uint8))]))
        for i in range(B)
    ]
    ref = refdata.mrm.mrc_collate(ref_inputs)

    records = [dict(input_ids=np.asarray(ids[i], np.int32),
                    img_feat=np.where(masks[i][:, None], 0.0,
                                      feats[i]).astype(np.float32),
                    img_pos_feat=pos7[i], img_masks=masks[i],
                    soft_labels_full=softs[i])
               for i in range(B)]
    ours = MrcDataset.collate(records, T, R, B + PAD_ROWS)

    check_core(ours, ref, TL, NBB)
    ref_lt = _np(ref["label_targets"])  # [sum(masked), n_label]
    k = 0
    for i in range(B):
        cnt = int(masks[i].sum())
        np.testing.assert_array_equal(ours["label_targets"][i, :cnt],
                                      ref_lt[k:k + cnt])
        k += cnt
    assert k == ref_lt.shape[0]


# --- ITM (+OT) --------------------------------------------------------------


def test_itm_ot_collate(refdata):
    from uniter_tpu.data.itm import ItmDataset

    toks, feats, pos7 = make_rows(4)
    ids = [[CLS] + tk + [SEP] for tk in toks]
    targets = [1, 0, 0, 1]
    ref_inputs = [
        (torch.tensor(ids[i]), torch.tensor(feats[i]),
         torch.tensor(pos7[i]),
         torch.ones(TL[i] + NBB[i], dtype=torch.long),
         torch.tensor([targets[i]], dtype=torch.long))
        for i in range(B)
    ]
    ref = refdata.itm.itm_ot_collate(ref_inputs)

    records = [dict(input_ids=np.asarray(ids[i], np.int32),
                    img_feat=feats[i], img_pos_feat=pos7[i],
                    target=targets[i])
               for i in range(B)]
    ours = ItmDataset.collate(records, T, R, B + PAD_ROWS)

    check_core(ours, ref, TL, NBB)
    np.testing.assert_array_equal(ours["targets"][:B], _np(ref["targets"]))
    assert (ours["targets"][B:] == -1).all()  # padding rows ignored by loss

    # OT geometry. The reference ships an explicit scatter that re-compacts
    # [txt_i ; img_i] rows back to the padded [max_tl ; max_nbb] layout
    # (itm.py:128-137) plus dense pad masks; our static layout IS that
    # padded layout, so the model derives the pads from attn_mask
    # (models/common.py:27-31) and needs no scatter. Check both against the
    # same contract:
    ot = ref["ot_inputs"]
    scatter = _np(ot["ot_scatter"])
    max_tl = _np(ref["input_ids"]).shape[1]
    joint = _np(ref["attn_masks"]).shape[1]
    for i in range(B):
        tl, nb = TL[i], NBB[i]
        np.testing.assert_array_equal(scatter[i, :tl], np.arange(tl))
        np.testing.assert_array_equal(
            scatter[i, tl:], np.arange(max_tl, max_tl + joint - tl))
        # pad masks: 1 at padding
        np.testing.assert_array_equal(
            _np(ot["txt_pad"])[i], (np.arange(max_tl) >= tl).astype(np.uint8))
        np.testing.assert_array_equal(
            _np(ot["img_pad"])[i],
            (np.arange(_np(ot["img_pad"]).shape[1]) >= nb).astype(np.uint8))
        # ours: the same masks fall out of attn_mask
        txt_pad = ~ours["attn_mask"][i, :T].astype(bool)
        img_pad = ~ours["attn_mask"][i, T:].astype(bool)
        np.testing.assert_array_equal(txt_pad, np.arange(T) >= tl)
        np.testing.assert_array_equal(img_pad, np.arange(R) >= nb)


# --- VQA --------------------------------------------------------------------


def test_vqa_collate(refdata):
    from uniter_tpu.data.vqa import VqaDataset, get_vqa_target

    toks, feats, pos7 = make_rows(5)
    ids = [[CLS] + tk + [SEP] for tk in toks]
    n_ans = 6
    examples = [
        {"target": {"labels": [1, 4], "scores": [0.9, 0.3]}},
        {"target": {"labels": [0], "scores": [1.0]}},
        {"target": {"labels": [], "scores": []}},
        {"target": {"labels": [5], "scores": [0.6]}},
    ]
    ref_targets = [refdata.vqa._get_vqa_target(ex, n_ans) for ex in examples]
    our_targets = [get_vqa_target(ex, n_ans) for ex in examples]
    for rt, ot in zip(ref_targets, our_targets):
        np.testing.assert_array_equal(_np(rt), ot)

    ref_inputs = [
        (torch.tensor(ids[i]), torch.tensor(feats[i]),
         torch.tensor(pos7[i]),
         torch.ones(TL[i] + NBB[i], dtype=torch.long), ref_targets[i])
        for i in range(B)
    ]
    ref = refdata.vqa.vqa_collate(ref_inputs)

    records = [dict(input_ids=np.asarray(ids[i], np.int32),
                    img_feat=feats[i], img_pos_feat=pos7[i],
                    target=our_targets[i], qid=f"q{i}")
               for i in range(B)]
    ours = VqaDataset.collate(records, T, R, B + PAD_ROWS)

    check_core(ours, ref, TL, NBB)
    np.testing.assert_array_equal(ours["targets"][:B], _np(ref["targets"]))
    assert (ours["targets"][B:] == 0).all()
    assert ours["qids"] == [f"q{i}" for i in range(B)]


# --- NLVR2 ------------------------------------------------------------------


def test_nlvr2_paired_collate(refdata):
    from uniter_tpu.data.nlvr2 import Nlvr2PairedDataset

    toks, feats, pos7 = make_rows(6)
    # two images per example: reuse feats pairwise (ex i gets imgs i, i^1)
    pair_idx = [(i, (i + 1) % B) for i in range(B)]
    targets = [1, 0, 1, 0]
    ids = [[CLS] + tk + [SEP] for tk in toks]

    ref_inputs = []
    for i in range(B):
        outs = []
        for k, j in enumerate(pair_idx[i]):
            outs.append((torch.tensor(ids[i]), torch.tensor(feats[j]),
                         torch.tensor(pos7[j]),
                         torch.ones(TL[i] + NBB[j], dtype=torch.long),
                         torch.tensor([k + 1] * NBB[j])))
        ref_inputs.append((tuple(outs), targets[i]))
    ref = refdata.nlvr2.nlvr2_paired_collate(ref_inputs)

    records = []
    for i in range(B):
        rows = []
        for k, j in enumerate(pair_idx[i]):
            rows.append(dict(
                input_ids=np.asarray(ids[i], np.int32), img_feat=feats[j],
                img_pos_feat=pos7[j],
                img_type_ids=np.full((NBB[j],), k + 1, np.int32)))
        records.append(dict(rows=rows, target=targets[i], qid=f"n{i}"))
    ours = Nlvr2PairedDataset.collate(records, T, R, B + PAD_ROWS)

    # row-major flattening matches the reference's concat order
    row_tls = [TL[i] for i in range(B) for _ in range(2)]
    row_nbs = [NBB[j] for i in range(B) for j in pair_idx[i]]
    check_core(ours, ref, row_tls, row_nbs, check_weight=False)
    r_type = _np(ref["img_type_ids"])
    for r, nb in enumerate(row_nbs):
        np.testing.assert_array_equal(ours["img_type_ids"][r, :nb],
                                      r_type[r, :nb])
        assert (ours["img_type_ids"][r, nb:] == 0).all()
    np.testing.assert_array_equal(ours["targets"][:B], _np(ref["targets"]))
    # per-pair weights: one per example, padding pairs zero
    assert (ours["ex_weight"][:B] == 1).all()
    assert (ours["ex_weight"][B:] == 0).all()


def test_nlvr2_triplet_collate(refdata):
    from uniter_tpu.data.nlvr2 import Nlvr2TripletDataset

    toks, feats, pos7 = make_rows(7, nbb=[3, 2, 4, 3])
    nbb1 = [3, 2, 4, 3]
    _, feats2, pos72 = make_rows(8, nbb=[2, 4, 3, 2])
    nbb2 = [2, 4, 3, 2]
    targets = [0, 1, 0, 1]
    ids = [[CLS] + tk + [SEP] for tk in toks]
    nb_tot = [a + b for a, b in zip(nbb1, nbb2)]

    ref_inputs = []
    for i in range(B):
        feat = torch.cat([torch.tensor(feats[i]), torch.tensor(feats2[i])])
        pos = torch.cat([torch.tensor(pos7[i]), torch.tensor(pos72[i])])
        type_ids = torch.tensor([1] * nbb1[i] + [2] * nbb2[i])
        ref_inputs.append(
            (torch.tensor(ids[i]), feat, pos,
             torch.ones(TL[i] + nb_tot[i], dtype=torch.long), type_ids,
             targets[i]))
    ref = refdata.nlvr2.nlvr2_triplet_collate(ref_inputs)

    records = []
    for i in range(B):
        records.append(dict(
            input_ids=np.asarray(ids[i], np.int32),
            img_feat=np.concatenate([feats[i], feats2[i]]),
            img_pos_feat=np.concatenate([pos7[i], pos72[i]]),
            img_type_ids=np.asarray([1] * nbb1[i] + [2] * nbb2[i], np.int32),
            target=targets[i], qid=f"n{i}"))
    ours = Nlvr2TripletDataset.collate(records, T, R, B + PAD_ROWS)

    check_core(ours, ref, TL, nb_tot)
    r_type = _np(ref["img_type_ids"])
    for i in range(B):
        np.testing.assert_array_equal(ours["img_type_ids"][i, :nb_tot[i]],
                                      r_type[i, :nb_tot[i]])
    np.testing.assert_array_equal(ours["targets"][:B], _np(ref["targets"]))


# --- VCR --------------------------------------------------------------------


def _vcr_example(rng):
    return {
        "input_ids": rng.randint(*V_RANGE, size=5).tolist(),
        "input_ids_as": [rng.randint(*V_RANGE, size=3).tolist()
                         for _ in range(4)],
        "input_ids_rs": [rng.randint(*V_RANGE, size=4).tolist()
                         for _ in range(4)],
        "qa_target": 2,
        "qar_target": 1,
        "img_fname": ["gt0", "det0"],
    }


class _FakeRefVcrTxtDb(dict):
    cls_ = CLS
    sep = SEP


@pytest.mark.parametrize("task", ["qa", "qar"])
def test_vcr_rows_and_collate(refdata, task):
    """VCR choice-row construction (CLS q [gt answer] SEP choice SEP with
    type ids 0/2/3, reference vcr.py:102-159) and the 4-rows-per-example
    collate, compared by running BOTH implementations' dataset row builders
    on the same example."""
    from uniter_tpu.data.vcr import VcrDataset

    rng = np.random.RandomState(9)
    ex = _vcr_example(rng)
    nb = 6
    feat = rng.randn(nb, D).astype(np.float32)
    pos7 = rng.rand(nb, 7).astype(np.float32)
    t_vcr = 24

    # reference dataset instance without DBs: fake txt_db + feat override
    rvd = refdata.vcr.VcrDataset.__new__(refdata.vcr.VcrDataset)
    rvd.task = task
    rvd.ids = ["ex0"]
    import copy

    # deep copies per side: the reference's _get_input_ids extends
    # txt_dump['input_ids'] IN PLACE for qar (vcr.py:107-116)
    rvd.txt_db = _FakeRefVcrTxtDb(ex0=copy.deepcopy(ex))
    rvd._get_img_feat = lambda fgt, fdet: (
        torch.tensor(feat), torch.tensor(pos7), nb)
    ref_outs = rvd[0]
    ref = refdata.vcr.vcr_collate([ref_outs])

    ovd = VcrDataset.__new__(VcrDataset)
    ovd.task = task
    ovd.ids = ["ex0"]
    ovd.txt_db = types.SimpleNamespace(cls_=CLS, sep=SEP)
    ovd.example = lambda i: copy.deepcopy(ex)
    ovd.joint_img_feat = lambda i: (feat, pos7, nb)
    rec = ovd.get_record(0)
    ours = VcrDataset.collate([rec], t_vcr, R, 1)

    row_tls = [len(_np(o[0])) for o in ref_outs]
    check_core(ours, ref, row_tls, [nb] * 4, t_bucket=t_vcr)
    r_type = _np(ref["txt_type_ids"])
    for r in range(4):
        np.testing.assert_array_equal(ours["txt_type_ids"][r, :row_tls[r]],
                                      r_type[r, :row_tls[r]])
        assert (ours["txt_type_ids"][r, row_tls[r]:] == 0).all()
    np.testing.assert_array_equal(ours["targets"][:4],
                                  _np(ref["targets"]).reshape(-1))
    # the correct choice is the task's target
    label = ex[f"{task}_target"]
    assert ours["targets"][label] == 1 and ours["targets"][:4].sum() == 1


# --- RE ---------------------------------------------------------------------


def test_re_collate(refdata):
    from uniter_tpu.data.re import ReDataset

    toks, feats, pos7 = make_rows(10)
    ids = [[CLS] + tk + [SEP] for tk in toks]
    targets = [2, 0, 1, 3]
    ref_inputs = [
        (torch.tensor(ids[i]), torch.tensor(feats[i]),
         torch.tensor(pos7[i]),
         torch.ones(TL[i] + NBB[i], dtype=torch.long),
         torch.zeros(NBB[i], dtype=torch.uint8),
         torch.tensor([targets[i]]))
        for i in range(B)
    ]
    ref = refdata.re.re_collate(ref_inputs)

    records = [dict(input_ids=np.asarray(ids[i], np.int32),
                    img_feat=feats[i], img_pos_feat=pos7[i],
                    target=targets[i], sent_id=f"s{i}")
               for i in range(B)]
    ours = ReDataset.collate(records, T, R, B + PAD_ROWS)

    check_core(ours, ref, TL, NBB)
    np.testing.assert_array_equal(ours["targets"][:B],
                                  _np(ref["targets"]).reshape(-1))
    # obj_masks: True at non-objects (padding) — reference pads with 1
    r_obj = _np(ref["obj_masks"])
    for i in range(B):
        nb = NBB[i]
        assert (r_obj[i, :nb] == 0).all() and (r_obj[i, nb:] == 1).all()
        assert (~ours["obj_masks"][i, :nb]).all()
        assert ours["obj_masks"][i, nb:].all()
    # our padding rows are fully masked objects
    assert ours["obj_masks"][B:].all()
