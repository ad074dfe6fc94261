"""Joint logit-parity vs the reference implementation's own torch modules.

SURVEY §7 M0 parity gate: random-init the reference model at a small config,
export its state_dict through models/checkpoint.py, and demand fp32 parity
on the joint txt+img encoder output (including gather_index-vs-static-layout
equivalence under ragged padding), the pooler, and every task head's logits:
MLM / MRFR / MRC-kl / ITM, NLVR2 (paired, triplet, paired-attn), VQA, VCR,
ITM-rank (+ the rank-head seeding surgery), and RE (mlp 1 and 2).

The reference modules import apex only for FusedLayerNorm, which is
numerically torch.nn.LayerNorm — stubbed below. The reference's dynamic
``gather_index`` re-compaction (model/model.py:321-334) is reproduced here
from its documented contract (data/data.py:271-279: row i reads txt
positions [0, tl) then img positions [max_tl, max_tl+nbb)) to drive the
torch side; our side uses the static [txt; img] layout. Valid positions
must agree; padding positions are don't-care in both layouts.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniter_tpu.config import UniterConfig
from uniter_tpu.models import checkpoint as ckpt

REF = "/root/reference/model"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference not mounted")

torch = pytest.importorskip("torch")

# --- tiny shared config ---------------------------------------------------
VOCAB, H, LAYERS, HEADS, INTER, MAXPOS = 240, 64, 2, 4, 128, 40
IMG = 32
B = 4
TL = [9, 5, 7, 4]          # real txt lengths (incl CLS/SEP)
NBB = [7, 3, 5, 6]         # real region counts
T, R = 12, 8               # our static bucket (deliberately != ref max)
RTOL, ATOL = 1e-4, 2e-5


@pytest.fixture(scope="module")
def refpkg(tmp_path_factory):
    """Import the reference model package (apex stubbed with LayerNorm)."""
    apex = types.ModuleType("apex")
    norm = types.ModuleType("apex.normalization")
    fln = types.ModuleType("apex.normalization.fused_layer_norm")
    fln.FusedLayerNorm = torch.nn.LayerNorm
    norm.fused_layer_norm = fln
    apex.normalization = norm
    sys.modules.setdefault("apex", apex)
    sys.modules.setdefault("apex.normalization", norm)
    sys.modules.setdefault("apex.normalization.fused_layer_norm", fln)

    root = tmp_path_factory.mktemp("refsrc")
    pkg = root / "refuniter"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    for f in ("model.py", "layer.py", "attention.py", "ot.py", "pretrain.py",
              "nlvr2.py", "vqa.py", "ve.py", "vcr.py", "itm.py", "re.py"):
        os.symlink(f"{REF}/{f}", pkg / f)
    sys.path.insert(0, str(root))
    import importlib

    mods = {
        name: importlib.import_module(f"refuniter.{name}")
        for name in ("model", "pretrain", "nlvr2", "vqa", "vcr", "itm", "re")
    }
    yield types.SimpleNamespace(**mods)
    sys.path.remove(str(root))


def ref_config(refpkg, type_vocab=2, vocab=VOCAB):
    return refpkg.model.UniterConfig(
        vocab, hidden_size=H, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=MAXPOS, type_vocab_size=type_vocab)


def our_config(type_vocab=2, vocab=VOCAB):
    return UniterConfig(
        vocab_size=vocab, hidden_size=H, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=MAXPOS, type_vocab_size=type_vocab,
        dtype="float32", attention_impl="xla")


# --- batch construction ----------------------------------------------------


def make_inputs(seed=0, b=B, tl=TL, nbb=NBB, vocab=VOCAB):
    rng = np.random.RandomState(seed)
    toks = [rng.randint(5, vocab, n).astype(np.int64) for n in tl[:b]]
    feats = [rng.randn(n, IMG).astype(np.float32) for n in nbb[:b]]
    pos7 = [rng.rand(n, 7).astype(np.float32) for n in nbb[:b]]
    return toks, feats, pos7


def our_batch(toks, feats, pos7, t=T, r=R, txt_types=None, img_types=None):
    b = len(toks)
    batch = dict(
        input_ids=np.zeros((b, t), np.int32),
        position_ids=np.broadcast_to(
            np.arange(t, dtype=np.int32), (b, t)).copy(),
        img_feat=np.zeros((b, r, IMG), np.float32),
        img_pos_feat=np.zeros((b, r, 7), np.float32),
        attn_mask=np.zeros((b, t + r), np.int32),
    )
    for i in range(b):
        tl, nb = len(toks[i]), len(feats[i])
        batch["input_ids"][i, :tl] = toks[i]
        batch["img_feat"][i, :nb] = feats[i]
        batch["img_pos_feat"][i, :nb] = pos7[i]
        batch["attn_mask"][i, :tl] = 1
        batch["attn_mask"][i, t:t + nb] = 1
    if txt_types is not None:
        batch["txt_type_ids"] = np.zeros((b, t), np.int32)
        for i in range(b):
            batch["txt_type_ids"][i, :len(txt_types[i])] = txt_types[i]
    if img_types is not None:
        batch["img_type_ids"] = np.tile(
            np.asarray(img_types, np.int32)[:, None], (1, r))
    return {k: jnp.asarray(v) for k, v in batch.items()}


def ref_batch(toks, feats, pos7, txt_types=None, img_types=None):
    """Torch batch in the reference's dynamic layout with gather_index
    (contract from /root/reference/data/data.py:271-279)."""
    b = len(toks)
    tls = [len(x) for x in toks]
    nbs = [len(x) for x in feats]
    t_ref, r_ref = max(tls), max(nbs)
    out_len = max(tl + nb for tl, nb in zip(tls, nbs))
    input_ids = torch.zeros(b, t_ref, dtype=torch.long)
    img_feat = torch.zeros(b, r_ref, IMG)
    img_pos = torch.zeros(b, r_ref, 7)
    attn = torch.zeros(b, out_len, dtype=torch.long)
    gather = torch.arange(out_len, dtype=torch.long)[None].repeat(b, 1)
    for i in range(b):
        input_ids[i, :tls[i]] = torch.from_numpy(np.asarray(toks[i]))
        img_feat[i, :nbs[i]] = torch.from_numpy(feats[i])
        img_pos[i, :nbs[i]] = torch.from_numpy(pos7[i])
        attn[i, :tls[i] + nbs[i]] = 1
        gather[i, tls[i]:tls[i] + nbs[i]] = torch.arange(
            t_ref, t_ref + nbs[i], dtype=torch.long)
    batch = dict(
        input_ids=input_ids,
        position_ids=torch.arange(t_ref, dtype=torch.long)[None].repeat(b, 1),
        img_feat=img_feat, img_pos_feat=img_pos,
        attn_masks=attn, gather_index=gather,
    )
    if txt_types is not None:
        tt = torch.zeros(b, t_ref, dtype=torch.long)
        for i in range(b):
            tt[i, :tls[i]] = torch.from_numpy(np.asarray(txt_types[i]))
        batch["txt_type_ids"] = tt
    if img_types is not None:
        batch["img_type_ids"] = torch.tensor(
            img_types, dtype=torch.long)[:, None].repeat(1, r_ref)
    return batch


def assert_seq_close(our_seq, ref_seq, tls, nbs, t=T):
    """Compare valid positions across the two layouts."""
    our_seq, ref_seq = np.asarray(our_seq), np.asarray(ref_seq)
    t_ref = ref_seq.shape[1] and max(tls)
    for i, (tl, nb) in enumerate(zip(tls, nbs)):
        np.testing.assert_allclose(
            our_seq[i, :tl], ref_seq[i, :tl], rtol=RTOL, atol=ATOL,
            err_msg=f"txt row {i}")
        np.testing.assert_allclose(
            our_seq[i, t:t + nb], ref_seq[i, tl:tl + nb], rtol=RTOL,
            atol=ATOL, err_msg=f"img row {i}")
    del t_ref


# --- param export -----------------------------------------------------------


def load_ref_params(our_init, ref_model, *, prefix="uniter",
                    allow_unfilled=(), layers=LAYERS):
    """Reference state_dict -> our flax params; assert full coverage."""
    norm = ckpt.normalize_state_dict(
        {k: v for k, v in ref_model.state_dict().items()})
    flat, missing, _ = ckpt.uniter_params_from_state_dict(norm, layers)
    assert not missing, missing
    params, filled1 = ckpt.merge_into_params(
        dict(our_init), flat, prefix=prefix)
    heads = ckpt.task_head_params_from_state_dict(norm)
    heads.update(ckpt.pretrain_head_params_from_state_dict(norm))
    params, filled2 = ckpt.merge_into_params(params, heads)
    unfilled = {
        p for p in set(ckpt.flatten(params)) - set(filled1) - set(filled2)
    }
    assert unfilled <= set(allow_unfilled), unfilled
    return params


# --- tests -------------------------------------------------------------------


def test_trunk_pooler_parity(refpkg):
    torch.manual_seed(0)
    rcfg = ref_config(refpkg)
    rmodel = refpkg.model.UniterModel(rcfg, IMG).eval()

    from uniter_tpu.models.encoder import UniterModel

    model = UniterModel(our_config(), IMG)
    toks, feats, pos7 = make_inputs()
    ob = our_batch(toks, feats, pos7)
    init = model.init(
        {"params": jax.random.PRNGKey(0)},
        ob["input_ids"], ob["position_ids"], ob["img_feat"],
        ob["img_pos_feat"], ob["attn_mask"],
        method=UniterModel.init_all)["params"]
    params = load_ref_params(init, rmodel, prefix="")

    rb = ref_batch(toks, feats, pos7)
    with torch.no_grad():
        ref_seq = rmodel(
            rb["input_ids"], rb["position_ids"], rb["img_feat"],
            rb["img_pos_feat"], rb["attn_masks"], rb["gather_index"],
            output_all_encoded_layers=False)
        ref_pooled = rmodel.pooler(ref_seq)

    our_seq = model.apply(
        {"params": params}, ob["input_ids"], ob["position_ids"],
        ob["img_feat"], ob["img_pos_feat"], ob["attn_mask"])
    assert_seq_close(our_seq, ref_seq.numpy(), [len(x) for x in toks],
                     [len(x) for x in feats])
    our_pooled = model.apply(
        {"params": params}, our_seq, method=lambda m, s: m.pooler(s))
    np.testing.assert_allclose(
        np.asarray(our_pooled), ref_pooled.numpy(), rtol=RTOL, atol=ATOL)

    # txt-only mode (reference model/model.py:348-351); the joint mask's 1s
    # cover tl+nbb positions, so the txt-only mask must be rebuilt
    txt_mask = torch.zeros_like(rb["input_ids"])
    for i, x in enumerate(toks):
        txt_mask[i, :len(x)] = 1
    with torch.no_grad():
        ref_txt = rmodel(
            rb["input_ids"], rb["position_ids"], None, None,
            txt_mask, None, output_all_encoded_layers=False)
    t_only = model.apply(
        {"params": params}, ob["input_ids"], ob["position_ids"],
        None, None, ob["attn_mask"][:, :T])
    for i, tl in enumerate(len(x) for x in toks):
        np.testing.assert_allclose(
            np.asarray(t_only)[i, :tl], ref_txt.numpy()[i, :tl],
            rtol=RTOL, atol=ATOL)


def test_pretrain_heads_parity(refpkg):
    torch.manual_seed(1)
    rcfg = ref_config(refpkg)
    rmodel = refpkg.pretrain.UniterForPretraining(
        rcfg, img_dim=IMG, img_label_dim=11).eval()

    from uniter_tpu.data.buckets import slots_from_labels, slots_from_mask
    from uniter_tpu.models.pretrain import UniterForPretraining

    model = UniterForPretraining(our_config(), img_dim=IMG, img_label_dim=11)
    toks, feats, pos7 = make_inputs(seed=1)
    tls = [len(x) for x in toks]
    nbs = [len(x) for x in feats]
    ob = dict(our_batch(toks, feats, pos7))
    ob["mlm_pos"] = jnp.zeros((B, 4), jnp.int32)
    ob["mrm_pos"] = jnp.zeros((B, 4), jnp.int32)
    init = model.init({"params": jax.random.PRNGKey(0)}, ob,
                      method=UniterForPretraining.init_all)["params"]
    params = load_ref_params(init, rmodel)
    rb = ref_batch(toks, feats, pos7)
    rng = np.random.RandomState(7)

    # ---- MLM: two masked txt positions per row
    txt_labels = np.full((B, T), -1, np.int64)
    for i, tl in enumerate(tls):
        for p in rng.choice(np.arange(1, tl - 1), 2, replace=False):
            txt_labels[i, p] = rng.randint(5, VOCAB)
    mlm_pos, mlm_tgt = slots_from_labels(txt_labels, 4)
    ob_mlm = dict(ob, mlm_pos=jnp.asarray(mlm_pos),
                  mlm_tgt=jnp.asarray(mlm_tgt))
    ours = np.asarray(model.apply({"params": params}, ob_mlm, "mlm", False,
                                  deterministic=True))
    rb_mlm = dict(rb, txt_labels=torch.from_numpy(
        txt_labels[:, :max(tls)]))
    with torch.no_grad():
        ref = rmodel(rb_mlm, "mlm", compute_loss=False).numpy()
    np.testing.assert_allclose(
        ours[np.asarray(mlm_tgt) != -1], ref, rtol=RTOL, atol=ATOL)

    # ---- MRFR + MRC: two masked regions per row
    img_masks = np.zeros((B, R), bool)
    for i, nb in enumerate(nbs):
        img_masks[i, rng.choice(nb, 2, replace=False)] = True
    mrm_pos, mrm_valid = slots_from_mask(img_masks, 4)
    r_ref = max(nbs)
    out_len = rb["attn_masks"].shape[1]
    img_mask_tgt = np.zeros((B, out_len), bool)
    for i, tl in enumerate(tls):
        for ridx in np.nonzero(img_masks[i])[0]:
            img_mask_tgt[i, tl + ridx] = True
    rb_mrm = dict(
        rb, img_masks=torch.from_numpy(img_masks[:, :r_ref]),
        img_mask_tgt=torch.from_numpy(img_mask_tgt),
        feat_targets=None, label_targets=None)
    ob_mrm = dict(ob, img_masks=jnp.asarray(img_masks.astype(np.int32)),
                  mrm_pos=jnp.asarray(mrm_pos),
                  mrm_valid=jnp.asarray(mrm_valid))
    valid = np.asarray(mrm_valid) > 0

    ours_fr = np.asarray(model.apply({"params": params}, ob_mrm, "mrfr",
                                     False, deterministic=True))
    with torch.no_grad():
        ref_fr = rmodel(rb_mrm, "mrfr", compute_loss=False).numpy()
    np.testing.assert_allclose(ours_fr[valid], ref_fr, rtol=RTOL, atol=ATOL)

    ours_rc = np.asarray(model.apply({"params": params}, ob_mrm, "mrc-kl",
                                     False, deterministic=True))
    with torch.no_grad():
        ref_rc = rmodel(rb_mrm, "mrc-kl", compute_loss=False).numpy()
    np.testing.assert_allclose(ours_rc[valid], ref_rc, rtol=RTOL, atol=ATOL)

    # ---- ITM scores (OT math has its own oracle test, test_ot_parity.py)
    ob_itm = dict(ob, targets=jnp.asarray(np.ones(B, np.int32)),
                  compute_ot=False)
    ours_itm, _ = model.apply({"params": params}, ob_itm, "itm", False,
                              deterministic=True)
    rb_itm = dict(rb, targets=torch.ones(B, dtype=torch.long),
                  ot_inputs=None)
    with torch.no_grad():
        ref_itm, _ = rmodel(rb_itm, "itm", compute_loss=False)
    np.testing.assert_allclose(np.asarray(ours_itm), ref_itm.numpy(),
                               rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("kind", ["paired", "triplet", "paired-attn"])
def test_nlvr2_parity(refpkg, kind, request):
    torch.manual_seed(2)
    rcfg = ref_config(refpkg)
    ref_cls = {"paired": refpkg.nlvr2.UniterForNlvr2Paired,
               "triplet": refpkg.nlvr2.UniterForNlvr2Triplet,
               "paired-attn": refpkg.nlvr2.UniterForNlvr2PairedAttn}[kind]
    rmodel = ref_cls(rcfg, IMG)
    rmodel.init_type_embedding()
    rmodel = rmodel.eval()

    from uniter_tpu.models.nlvr2 import MODEL_REGISTRY

    model = MODEL_REGISTRY[kind](our_config(type_vocab=3), IMG)
    toks, feats, pos7 = make_inputs(seed=2)
    img_types = [1, 2, 1, 2]  # paired rows: left / right
    ob = our_batch(toks, feats, pos7, img_types=img_types)
    init = model.init({"params": jax.random.PRNGKey(0)}, ob, False)["params"]
    params = load_ref_params(init, rmodel)

    rb = ref_batch(toks, feats, pos7, img_types=img_types)
    with torch.no_grad():
        ref_scores = rmodel(rb, compute_loss=False).numpy()
    ours = np.asarray(model.apply({"params": params}, ob, False))
    np.testing.assert_allclose(ours, ref_scores, rtol=RTOL, atol=5e-5)


def test_vqa_parity(refpkg):
    torch.manual_seed(3)
    rmodel = refpkg.vqa.UniterForVisualQuestionAnswering(
        ref_config(refpkg), IMG, num_answer=17).eval()

    from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering

    model = UniterForVisualQuestionAnswering(
        our_config(), img_dim=IMG, num_answer=17)
    toks, feats, pos7 = make_inputs(seed=3)
    ob = our_batch(toks, feats, pos7)
    init = model.init({"params": jax.random.PRNGKey(0)}, ob, False)["params"]
    params = load_ref_params(init, rmodel)
    rb = ref_batch(toks, feats, pos7)
    with torch.no_grad():
        ref_scores = rmodel(rb, compute_loss=False).numpy()
    ours = np.asarray(model.apply({"params": params}, ob, False))
    np.testing.assert_allclose(ours, ref_scores, rtol=RTOL, atol=ATOL)

    # loss parity: elementwise BCE-with-logits vs soft targets
    tgt = np.random.RandomState(9).rand(B, 17).astype(np.float32)
    ours_l = np.asarray(model.apply(
        {"params": params}, {**ob, "targets": jnp.asarray(tgt)}, True))
    with torch.no_grad():
        ref_l = rmodel({**rb, "targets": torch.from_numpy(tgt)},
                       compute_loss=True).numpy()
    np.testing.assert_allclose(ours_l, ref_l, rtol=RTOL, atol=ATOL)


def test_vcr_parity(refpkg):
    torch.manual_seed(4)
    rmodel = refpkg.vcr.UniterForVisualCommonsenseReasoning(
        ref_config(refpkg), IMG)
    rmodel.init_type_embedding()
    rmodel.init_word_embedding(81)
    rmodel = rmodel.eval()

    from uniter_tpu.models.vcr import UniterForVisualCommonsenseReasoning

    model = UniterForVisualCommonsenseReasoning(
        our_config(type_vocab=4, vocab=VOCAB + 81), img_dim=IMG)
    toks, feats, pos7 = make_inputs(seed=4)
    # VCR txt type ids: question 0, answer 2, rationale 3 (data/vcr.py:139-148)
    txt_types = [np.asarray(([0] * 3 + [2] * 3 + [3] * len(t))[:len(t)])
                 for t in toks]
    ob = our_batch(toks, feats, pos7, txt_types=txt_types)
    init = model.init({"params": jax.random.PRNGKey(0)}, ob, False)["params"]
    params = load_ref_params(init, rmodel)
    rb = ref_batch(toks, feats, pos7, txt_types=txt_types)
    with torch.no_grad():
        ref_scores = rmodel(rb, compute_loss=False).numpy()  # col 1 only
    ours = np.asarray(model.apply({"params": params}, ob, False))
    np.testing.assert_allclose(ours, ref_scores, rtol=RTOL, atol=ATOL)


def test_itm_rank_parity_and_seed_surgery(refpkg):
    torch.manual_seed(5)
    rmodel = refpkg.itm.UniterForImageTextRetrieval(
        ref_config(refpkg), IMG, margin=0.2)

    from uniter_tpu.models.itm import (
        UniterForImageTextRetrieval, init_rank_output_from_itm,
    )

    model = UniterForImageTextRetrieval(our_config(), img_dim=IMG, margin=0.2)
    toks, feats, pos7 = make_inputs(seed=5)
    ob = our_batch(toks, feats, pos7)
    init = model.init({"params": jax.random.PRNGKey(0)}, ob, False)["params"]
    # export BEFORE the reference's init_output; apply OUR surgery and
    # compare against the reference AFTER its init_output -> proves
    # init_rank_output_from_itm == reference itm.py:25-28
    params = load_ref_params(init, rmodel, allow_unfilled=(
        "rank_output/kernel", "rank_output/bias"))
    params = init_rank_output_from_itm(params)
    rmodel.init_output()
    rmodel = rmodel.eval()

    rb = ref_batch(toks, feats, pos7)
    with torch.no_grad():
        ref_scores = rmodel(rb, compute_loss=False).numpy()
    ours = np.asarray(model.apply({"params": params}, ob, False))
    np.testing.assert_allclose(ours, ref_scores, rtol=RTOL, atol=ATOL)

    # margin rank loss parity (groups of 2: pos, neg)
    ours_l = np.asarray(model.apply(
        {"params": params}, ob, True, sample_size=2))
    with torch.no_grad():
        ref_l = rmodel({**rb, "sample_size": 2}, compute_loss=True).numpy()
    np.testing.assert_allclose(ours_l, ref_l, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("mlp", [1, 2])
def test_re_parity(refpkg, mlp):
    torch.manual_seed(6)
    rmodel = refpkg.re.UniterForReferringExpressionComprehension(
        ref_config(refpkg), IMG, loss="cls", mlp=mlp).eval()

    from uniter_tpu.models.re import UniterForReferringExpressionComprehension

    model = UniterForReferringExpressionComprehension(
        our_config(), img_dim=IMG, loss_type="cls", mlp=mlp)
    toks, feats, pos7 = make_inputs(seed=6)
    nbs = [len(x) for x in feats]
    obj_masks = np.ones((B, R), bool)
    for i, nb in enumerate(nbs):
        obj_masks[i, :nb] = False
    ob = dict(our_batch(toks, feats, pos7),
              obj_masks=jnp.asarray(obj_masks))
    init = model.init({"params": jax.random.PRNGKey(0)}, ob, False)["params"]
    params = load_ref_params(init, rmodel)

    r_ref = max(nbs)
    ref_obj = torch.from_numpy(obj_masks[:, :r_ref])
    rb = dict(ref_batch(toks, feats, pos7), obj_masks=ref_obj,
              txt_lens=[len(t) for t in toks], num_bbs=nbs)
    with torch.no_grad():
        ref_scores = rmodel(rb, compute_loss=False).numpy()
    ours = np.asarray(model.apply({"params": params}, ob, False))
    for i, nb in enumerate(nbs):
        np.testing.assert_allclose(ours[i, :nb], ref_scores[i, :nb],
                                   rtol=RTOL, atol=ATOL)

    # cls loss parity: targets index gt region
    tgt = np.asarray([min(2, nb - 1) for nb in nbs], np.int64)
    ours_l = np.asarray(model.apply(
        {"params": params}, {**ob, "targets": jnp.asarray(tgt)}, True))
    with torch.no_grad():
        ref_l = rmodel({**rb, "targets": torch.from_numpy(tgt)[:, None]},
                       compute_loss=True).numpy()
    np.testing.assert_allclose(ours_l, ref_l, rtol=RTOL, atol=ATOL)


def test_export_roundtrip(refpkg):
    """export_state_dict is the exact inverse of the import maps: loading
    the exported dict back reproduces every parameter bit-for-bit, and the
    exported keys match the reference model's own state_dict keys."""
    torch.manual_seed(8)
    rmodel = refpkg.vqa.UniterForVisualQuestionAnswering(
        ref_config(refpkg), IMG, num_answer=17).eval()

    from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering

    model = UniterForVisualQuestionAnswering(
        our_config(), img_dim=IMG, num_answer=17)
    toks, feats, pos7 = make_inputs(seed=8)
    ob = our_batch(toks, feats, pos7)
    init = model.init({"params": jax.random.PRNGKey(0)}, ob, False)["params"]
    params = load_ref_params(init, rmodel)

    sd = ckpt.export_state_dict(params)
    ref_keys = {k for k in rmodel.state_dict().keys()
                if not k.endswith("position_ids")}
    assert set(sd) == ref_keys, set(sd) ^ ref_keys
    for k, v in rmodel.state_dict().items():
        if k in sd:
            np.testing.assert_array_equal(sd[k], v.numpy(), err_msg=k)

    # roundtrip: import the export -> identical params
    norm = ckpt.normalize_state_dict(sd)
    flat, missing, _ = ckpt.uniter_params_from_state_dict(norm, LAYERS)
    assert not missing
    params2, _ = ckpt.merge_into_params(dict(init), flat, prefix="uniter")
    heads = ckpt.task_head_params_from_state_dict(norm)
    params2, _ = ckpt.merge_into_params(params2, heads)
    for p, a in ckpt.flatten(params).items():
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(ckpt.flatten(params2)[p]), err_msg=p)


@pytest.mark.e2e  # 12L/768H torch-vs-jax build (CI-tier)
def test_full_width_base_parity(refpkg):
    """uniter-base geometry (12L / 768H / 12 heads / 3072 inter / 28996
    vocab / 2048-dim features — /root/reference/config/uniter-base.json):
    the toy-width gate (H=64) cannot catch width-dependent bugs in head-dim
    packing, transpose conventions at 768, or the 28996-vocab MLM tying.
    Covers trunk + pooler + the tied MLM decode + ITM head in fp32."""
    torch.manual_seed(6)
    FV, FH, FL, FHEADS, FI, FIMG = 28996, 768, 12, 12, 3072, 2048
    FT, FR = 12, 8
    rcfg = refpkg.model.UniterConfig(
        FV, hidden_size=FH, num_hidden_layers=FL,
        num_attention_heads=FHEADS, intermediate_size=FI,
        max_position_embeddings=512, type_vocab_size=2)
    rmodel = refpkg.pretrain.UniterForPretraining(
        rcfg, img_dim=FIMG, img_label_dim=1601).eval()

    from uniter_tpu.data.buckets import slots_from_labels
    from uniter_tpu.models.pretrain import UniterForPretraining

    cfg = UniterConfig(
        vocab_size=FV, hidden_size=FH, num_hidden_layers=FL,
        num_attention_heads=FHEADS, intermediate_size=FI,
        max_position_embeddings=512, type_vocab_size=2,
        dtype="float32", attention_impl="xla")
    model = UniterForPretraining(cfg, img_dim=FIMG, img_label_dim=1601)

    rng = np.random.RandomState(11)
    b, tls, nbs = 2, [9, 6], [7, 5]
    toks = [rng.randint(5, FV, n).astype(np.int64) for n in tls]
    feats = [rng.randn(n, FIMG).astype(np.float32) for n in nbs]
    pos7 = [rng.rand(n, 7).astype(np.float32) for n in nbs]

    ob = dict(
        input_ids=np.zeros((b, FT), np.int32),
        position_ids=np.broadcast_to(
            np.arange(FT, dtype=np.int32), (b, FT)).copy(),
        img_feat=np.zeros((b, FR, FIMG), np.float32),
        img_pos_feat=np.zeros((b, FR, 7), np.float32),
        attn_mask=np.zeros((b, FT + FR), np.int32),
    )
    for i in range(b):
        ob["input_ids"][i, :tls[i]] = toks[i]
        ob["img_feat"][i, :nbs[i]] = feats[i]
        ob["img_pos_feat"][i, :nbs[i]] = pos7[i]
        ob["attn_mask"][i, :tls[i]] = 1
        ob["attn_mask"][i, FT:FT + nbs[i]] = 1
    ob = {k: jnp.asarray(v) for k, v in ob.items()}
    ob["mlm_pos"] = jnp.zeros((b, 4), jnp.int32)
    ob["mrm_pos"] = jnp.zeros((b, 4), jnp.int32)
    init = model.init({"params": jax.random.PRNGKey(0)}, ob,
                      method=UniterForPretraining.init_all)["params"]
    params = load_ref_params(init, rmodel, layers=FL)

    t_ref, r_ref = max(tls), max(nbs)
    out_len = max(tl + nb for tl, nb in zip(tls, nbs))
    rb = dict(
        input_ids=torch.zeros(b, t_ref, dtype=torch.long),
        position_ids=torch.arange(
            t_ref, dtype=torch.long)[None].repeat(b, 1),
        img_feat=torch.zeros(b, r_ref, FIMG),
        img_pos_feat=torch.zeros(b, r_ref, 7),
        attn_masks=torch.zeros(b, out_len, dtype=torch.long),
        gather_index=torch.arange(
            out_len, dtype=torch.long)[None].repeat(b, 1),
    )
    for i in range(b):
        rb["input_ids"][i, :tls[i]] = torch.from_numpy(toks[i])
        rb["img_feat"][i, :nbs[i]] = torch.from_numpy(feats[i])
        rb["img_pos_feat"][i, :nbs[i]] = torch.from_numpy(pos7[i])
        rb["attn_masks"][i, :tls[i] + nbs[i]] = 1
        rb["gather_index"][i, tls[i]:tls[i] + nbs[i]] = torch.arange(
            t_ref, t_ref + nbs[i], dtype=torch.long)

    # MLM (tied decode over the full 28996 vocab)
    txt_labels = np.full((b, FT), -1, np.int64)
    for i, tl in enumerate(tls):
        for p in rng.choice(np.arange(1, tl - 1), 2, replace=False):
            txt_labels[i, p] = rng.randint(5, FV)
    mlm_pos, mlm_tgt = slots_from_labels(txt_labels, 4)
    ob_mlm = dict(ob, mlm_pos=jnp.asarray(mlm_pos),
                  mlm_tgt=jnp.asarray(mlm_tgt))
    ours = np.asarray(model.apply({"params": params}, ob_mlm, "mlm", False,
                                  deterministic=True))
    rb_mlm = dict(rb, txt_labels=torch.from_numpy(txt_labels[:, :t_ref]))
    with torch.no_grad():
        ref = rmodel(rb_mlm, "mlm", compute_loss=False).numpy()
    np.testing.assert_allclose(
        ours[np.asarray(mlm_tgt) != -1], ref, rtol=1e-4, atol=1e-4)

    # ITM (pooler + head at full width)
    ob_itm = dict(ob, targets=jnp.asarray(np.ones(b, np.int32)),
                  compute_ot=False)
    ours_itm, _ = model.apply({"params": params}, ob_itm, "itm", False,
                              deterministic=True)
    rb_itm = dict(rb, targets=torch.ones(b, dtype=torch.long),
                  ot_inputs=None)
    with torch.no_grad():
        ref_itm, _ = rmodel(rb_itm, "itm", compute_loss=False)
    np.testing.assert_allclose(np.asarray(ours_itm), ref_itm.numpy(),
                               rtol=1e-4, atol=1e-4)
