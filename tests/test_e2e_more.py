"""Driver smoke tests for RE, VCR fine-tune, ITM, and ITM hard negatives."""

import json
import os

import numpy as np
import pytest
pytestmark = pytest.mark.e2e  # slow CLI-driver pipeline: -m 'not e2e' skips


def _model_cfg(root, vocab=300):
    cfg = dict(
        vocab_size=vocab, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
        hidden_act="gelu", initializer_range=0.02,
    )
    path = str(root / "model.json")
    with open(path, "w") as f:
        json.dump(cfg, f)
    return path


def test_train_re_e2e(tmp_path):
    from uniter_tpu.data import write_img_db
    from uniter_tpu.data.txt_db import TxtDb
    import train_re
    from uniter_tpu.utils.misc import parse_with_config

    rng = np.random.RandomState(0)
    n_img = 4
    img_records, images = {}, []
    for i in range(n_img):
        iid = 1000 + i
        nbb = rng.randint(4, 7)
        name = f"visual_grounding_coco_gt_{iid:012}.npz"
        img_records[name] = dict(
            features=rng.randn(nbb, 2048).astype(np.float16),
            norm_bb=rng.rand(nbb, 6).astype(np.float16),
            conf=np.ones(nbb, np.float16),
            soft_labels=rng.rand(nbb, 1601).astype(np.float16),
        )
        images.append(dict(
            id=iid, file_name=f"{iid}.jpg",
            ann_ids=[iid * 10 + k for k in range(nbb)],
            height=480, width=640))
    img_dir = str(tmp_path / "img")
    write_img_db(img_dir, img_records, conf_th=0.2, max_bb=10, min_bb=1)

    txt_dir = str(tmp_path / "txt")
    os.makedirs(txt_dir)
    db = TxtDb(txt_dir, readonly=False)
    refs, anns, id2len = [], [], {}
    sent_counter = 0
    for i, img in enumerate(images):
        for k, ann_id in enumerate(img["ann_ids"]):
            anns.append(dict(id=ann_id, area=100, bbox=[10, 10, 50, 60],
                             image_id=img["id"], category_id=1, iscrowd=0))
        ref_sents = []
        for _ in range(2):
            sid = sent_counter
            sent_counter += 1
            ids = [int(x) for x in rng.randint(110, 300, rng.randint(3, 7))]
            db[str(sid)] = dict(
                sent_id=sid, sent="", ref_id=i, ann_id=img["ann_ids"][0],
                image_id=img["id"], bbox=[10, 10, 50, 60], input_ids=ids)
            id2len[str(sid)] = len(ids)
            ref_sents.append(sid)
        refs.append(dict(ref_id=i, ann_id=img["ann_ids"][0],
                         image_id=img["id"], split="train",
                         sent_ids=ref_sents, sentences=[]))
    for name, obj in (("refs", refs), ("annotations", anns),
                      ("categories", [dict(id=1, name="obj",
                                           supercategory="thing")]),
                      ("images", images), ("id2len", id2len),
                      ("meta", {"CLS": 101, "SEP": 102, "MASK": 103,
                                "v_range": [104, 300]})):
        with open(os.path.join(txt_dir, f"{name}.json"), "w") as f:
            json.dump(obj, f)

    argv = [
        "--train_txt_db", txt_dir, "--train_img_db", img_dir,
        "--val_txt_db", txt_dir, "--val_img_db", img_dir,
        "--model_config", _model_cfg(tmp_path),
        "--output_dir", str(tmp_path / "out"),
        "--train_batch_size", "256", "--val_batch_size", "256",
        "--num_train_steps", "2", "--valid_steps", "2",
        "--warmup_steps", "1", "--max_bb", "10", "--min_bb", "1",
        "--dtype", "float32", "--seed", "1", "--train_loss", "rank",
    ]
    opts = parse_with_config(train_re.get_parser(), argv)
    state = train_re.main(opts)
    assert int(state.step) == 2

    # chain RE inference: IoU>0.5 accuracy on gt boxes + predictions dump
    import inf_re

    iargv = inf_re.get_parser().parse_args([
        "--txt_db", txt_dir, "--img_db", img_dir,
        "--train_dir", str(tmp_path / "out"),
        "--output_dir", str(tmp_path / "reinf"),
        "--use_gt_feat", "--batch_size", "256",
    ])
    acc = inf_re.main(iargv)
    assert 0.0 <= acc <= 1.0
    res = json.load(open(str(tmp_path / "reinf") + "/results_gt.json"))
    assert res["n_ex"] == 8 and len(res["predictions"]) == 8

    # best-checkpoint tracking (reference train_re.py:259-263): the
    # step-2 validation saved ckpt/model_step_best.msgpack + sidecar
    best = os.path.join(str(tmp_path / "out"), "ckpt",
                        "model_step_best.msgpack")
    assert os.path.exists(best)
    binfo = json.load(open(best.replace(".msgpack", ".json")))
    assert binfo["step"] == 2 and 0.0 <= binfo["value"] <= 1.0

    # colon-separated multi-split eval in one invocation (reference
    # inf_re.py:76-77): per-split result files, micro-averaged return;
    # --ckpt best resolves the best snapshot (reference inf_re.py:53-56)
    margv = inf_re.get_parser().parse_args([
        "--txt_db", f"{txt_dir}:{txt_dir}", "--img_db", img_dir,
        "--train_dir", str(tmp_path / "out"),
        "--output_dir", str(tmp_path / "reinf_multi"),
        "--use_gt_feat", "--batch_size", "256", "--ckpt", "best",
    ])
    macc = inf_re.main(margv)
    assert abs(macc - acc) < 1e-9
    # same basename twice -> index-disambiguated files, one per split
    split = os.path.basename(os.path.normpath(txt_dir))
    for i in range(2):
        mres = json.load(open(
            str(tmp_path / "reinf_multi") + f"/results_{split}{i}_gt.json"))
        assert mres["n_ex"] == 8 and abs(mres["acc"] - acc) < 1e-9


@pytest.fixture()
def itm_env(tmp_path):
    from uniter_tpu.data import write_img_db, write_txt_db

    rng = np.random.RandomState(0)
    img_names = [f"flickr_{i:06d}.npz" for i in range(8)]
    img_records = {}
    for n in img_names:
        nbb = rng.randint(4, 8)
        img_records[n] = dict(
            features=rng.randn(nbb, 2048).astype(np.float16),
            norm_bb=rng.rand(nbb, 6).astype(np.float16),
            conf=np.linspace(1, 0.3, nbb).astype(np.float16),
            soft_labels=rng.rand(nbb, 1601).astype(np.float16),
        )
    img_dir = str(tmp_path / "img")
    write_img_db(img_dir, img_records, conf_th=0.2, max_bb=8, min_bb=3)
    meta = {"CLS": 101, "SEP": 102, "MASK": 103, "v_range": [104, 300]}
    recs, t2i = {}, {}
    for i in range(16):
        tid = f"cap_{i}"
        recs[tid] = dict(
            input_ids=[int(x) for x in
                       rng.randint(110, 300, rng.randint(3, 7))],
            img_fname=img_names[i % 8],
        )
        t2i[tid] = img_names[i % 8]
    txt_dir = str(tmp_path / "txt")
    write_txt_db(txt_dir, recs, meta, t2i)
    return dict(txt=txt_dir, img=img_dir, cfg=_model_cfg(tmp_path),
                root=str(tmp_path))


def test_train_itm_e2e(itm_env):
    import train_itm
    from uniter_tpu.utils.misc import parse_with_config

    argv = [
        "--train_txt_db", itm_env["txt"], "--train_img_db", itm_env["img"],
        "--val_txt_db", itm_env["txt"], "--val_img_db", itm_env["img"],
        "--model_config", itm_env["cfg"],
        "--output_dir", itm_env["root"] + "/itm_out",
        "--train_batch_size", "512", "--num_train_steps", "2",
        "--valid_steps", "2", "--warmup_steps", "1",
        "--max_bb", "8", "--min_bb", "3", "--inf_minibatch_size", "8",
        "--dtype", "float32", "--seed", "1",
    ]
    opts = parse_with_config(train_itm.get_parser(), argv)
    state = train_itm.main(opts)
    assert int(state.step) == 2


def test_inf_itm_e2e_and_zero_shot(itm_env):
    """inf_itm end to end: trained-checkpoint scoring (fast == batched
    impl), artifacts, and the zero-shot path (no --train_dir: pretrained
    .pt + --model_config, rank head seeded from the ITM head — reference
    inf_itm.py:41-61)."""
    import inf_itm
    import train_itm
    from uniter_tpu.utils.misc import parse_with_config

    out = itm_env["root"] + "/itm_out"
    argv = [
        "--train_txt_db", itm_env["txt"], "--train_img_db", itm_env["img"],
        "--val_txt_db", itm_env["txt"], "--val_img_db", itm_env["img"],
        "--model_config", itm_env["cfg"], "--output_dir", out,
        "--train_batch_size", "512", "--num_train_steps", "2",
        "--valid_steps", "2", "--warmup_steps", "1",
        "--max_bb", "8", "--min_bb", "3", "--inf_minibatch_size", "8",
        "--dtype", "float32", "--seed", "1",
    ]
    train_itm.main(parse_with_config(train_itm.get_parser(), argv))

    common = [
        "--txt_db", itm_env["txt"], "--img_db", itm_env["img"],
        "--batch_size", "8", "--txt_bucket", "16", "--img_bucket", "8",
        "--txt_tile", "8", "--img_tile", "8", "--dtype", "float32",
    ]
    logs = inf_itm.main(inf_itm.get_parser().parse_args(
        common + ["--train_dir", out,
                  "--output_dir", itm_env["root"] + "/itm_inf"]))
    assert {"txt_r1", "img_r1"} <= set(logs) or len(logs) >= 4
    mat = np.load(itm_env["root"] + "/itm_inf/score_matrix.npz")
    assert mat["score_matrix"].shape == (16, 8)

    logs_b = inf_itm.main(inf_itm.get_parser().parse_args(
        common + ["--train_dir", out, "--eval_impl", "batched",
                  "--output_dir", itm_env["root"] + "/itm_inf_b"]))
    for k, v in logs.items():
        assert abs(v - logs_b[k]) < 1e-4, (k, v, logs_b[k])

    # zero-shot: synthetic released-format .pt, no training dir
    import torch

    from tests.test_pt_checkpoint_load import make_reference_state_dict

    pt = itm_env["root"] + "/uniter-tiny.pt"
    torch.save(make_reference_state_dict(vocab=300, h=48, layers=2,
                                         heads=4, ff=96), pt)
    zlogs = inf_itm.main(inf_itm.get_parser().parse_args(
        common + ["--ckpt", pt, "--model_config", itm_env["cfg"],
                  "--max_bb", "8", "--min_bb", "3",
                  "--output_dir", itm_env["root"] + "/itm_zs"]))
    assert set(zlogs) == set(logs)


def test_train_itm_hard_negatives_e2e(itm_env):
    import train_itm_hard_negatives as hn
    from uniter_tpu.utils.misc import parse_with_config

    argv = [
        "--train_txt_db", itm_env["txt"], "--train_img_db", itm_env["img"],
        "--val_txt_db", itm_env["txt"], "--val_img_db", itm_env["img"],
        "--model_config", itm_env["cfg"],
        "--output_dir", itm_env["root"] + "/hn_out",
        "--negative_size", "7", "--hard_neg_size", "3",
        "--num_train_steps", "2", "--valid_steps", "2",
        "--warmup_steps", "1", "--train_batch_size", "2",
        "--max_bb", "8", "--min_bb", "3", "--inf_minibatch_size", "8",
        "--txt_bucket", "16", "--img_bucket", "8",
        "--dtype", "float32", "--seed", "1",
    ]
    opts = parse_with_config(hn.get_parser(), argv)
    state = hn.main(opts)
    assert int(state.step) == 2


def test_train_vcr_e2e(tmp_path, request):
    # reuse the vcr fixture machinery from test_vcr_pipeline via import
    from tests.test_vcr_pipeline import vcr_env as vcr_fixture  # noqa
    pytest.skip("covered by test_vcr_pipeline pretrain e2e; fine-tune "
                "driver exercised in test_vcr_finetune below")


def test_vcr_finetune_e2e(tmp_path):
    import train_vcr
    from uniter_tpu.utils.misc import parse_with_config
    from uniter_tpu.data import write_img_db
    from uniter_tpu.data.txt_db import TxtDb

    rng = np.random.RandomState(0)

    def mk_img(subdir, names, gt=False):
        recs = {}
        for n in names:
            nbb = rng.randint(4, 7)
            recs[n] = dict(
                features=rng.randn(nbb, 2048).astype(np.float16),
                norm_bb=rng.rand(nbb, 6).astype(np.float16),
                conf=np.linspace(1, 0.3, nbb).astype(np.float16),
                soft_labels=rng.rand(nbb, 1601).astype(np.float16))
        d = str(tmp_path / subdir)
        if gt:  # released gt layout: feat_numbb100 store + nbb sidecar
            write_img_db(d, recs, conf_th=-1, num_bb=100)
        else:
            write_img_db(d, recs, conf_th=0.2, max_bb=8, min_bb=3)
        return d

    gt_names = [f"g{i}.npz" for i in range(4)]
    det_names = [f"d{i}.npz" for i in range(4)]
    img_gt, img_det = (mk_img("gt", gt_names, gt=True),
                   mk_img("det", det_names))

    txt_dir = str(tmp_path / "txt")
    os.makedirs(txt_dir)
    db = TxtDb(txt_dir, readonly=False)
    id2len_qa, id2len_qar, t2i = {}, {}, {}
    for i in range(8):
        tid = f"v{i}"
        q = [int(x) for x in rng.randint(110, 280, 5)]
        db[tid] = dict(
            input_ids=q,
            input_ids_as=[[int(x) for x in rng.randint(110, 280, 3)]
                          for _ in range(4)],
            input_ids_rs=[[int(x) for x in rng.randint(110, 280, 4)]
                          for _ in range(4)],
            qa_target=i % 4, qar_target=(i + 1) % 4,
            img_fname=[gt_names[i % 4], det_names[i % 4]])
        id2len_qa[tid] = 10
        id2len_qar[tid] = 15
        t2i[tid] = [gt_names[i % 4], det_names[i % 4]]
    for name, obj in (("id2len_qa", id2len_qa), ("id2len_qar", id2len_qar),
                      ("txt2img", t2i),
                      ("meta", {"CLS": 101, "SEP": 102, "MASK": 103,
                                "v_range": [104, 281]})):
        with open(os.path.join(txt_dir, f"{name}.json"), "w") as f:
            json.dump(obj, f)
    with open(os.path.join(txt_dir, "img2txts.json"), "w") as f:
        json.dump({}, f)

    argv = [
        "--train_txt_db", txt_dir, "--train_img_db", img_det,
        "--train_img_db_gt", img_gt,
        "--val_txt_db", txt_dir, "--val_img_db", img_det,
        "--val_img_db_gt", img_gt,
        "--model_config", _model_cfg(tmp_path, vocab=281),
        "--output_dir", str(tmp_path / "vout"),
        "--tasks", "qa",
        "--train_batch_size", "512", "--val_batch_size", "512",
        "--num_train_steps", "2", "--valid_steps", "2",
        "--warmup_steps", "1", "--max_bb", "8", "--min_bb", "3",
        "--dtype", "float32", "--seed", "1",
    ]
    opts = parse_with_config(train_vcr.get_parser(), argv)
    state = train_vcr.main(opts)
    assert int(state.step) == 2

    # chain VCR inference: val accuracies + test leaderboard CSV
    import inf_vcr

    iargv = inf_vcr.get_parser().parse_args([
        "--txt_db", txt_dir, "--img_db", img_det, "--img_db_gt", img_gt,
        "--train_dir", str(tmp_path / "vout"),
        "--output_dir", str(tmp_path / "vinf"),
        "--split", "val", "--batch_size", "512",
    ])
    logs = inf_vcr.main(iargv)
    assert logs["n_ex"] == 8 and 0.0 <= logs["qa_acc"] <= 1.0
    iargv = inf_vcr.get_parser().parse_args([
        "--txt_db", txt_dir, "--img_db", img_det, "--img_db_gt", img_gt,
        "--train_dir", str(tmp_path / "vout"),
        "--output_dir", str(tmp_path / "vinf"),
        "--split", "test", "--batch_size", "512",
    ])
    csv_path = inf_vcr.main(iargv)
    lines = open(csv_path).read().strip().splitlines()
    assert len(lines) == 1 + 8 and lines[0].startswith("annot_id")


def test_fast_score_matrix_matches_batched(itm_env):
    """Device-resident tiled scoring == per-text batched scoring (the fast
    path is a pure re-batching: every (text, image) pair sees identical
    padded inputs)."""
    import jax
    import jax.numpy as jnp

    from uniter_tpu.config import UniterConfig
    from uniter_tpu.data.img_db import DetectFeatDb
    from uniter_tpu.data.itm import ItmEvalDataset
    from uniter_tpu.data.txt_db import TxtTokDb
    from uniter_tpu.models.itm import UniterForImageTextRetrieval
    from uniter_tpu.utils.itm_eval import inference_score_matrix
    from uniter_tpu.utils.itm_fast import fast_score_matrix

    cfg = UniterConfig.from_json_file(itm_env["cfg"], dtype="float32")
    model = UniterForImageTextRetrieval(cfg, img_dim=2048)
    txt_db = TxtTokDb(itm_env["txt"], max_txt_len=-1)
    img_db = DetectFeatDb(itm_env["img"], conf_th=0.2, max_bb=8, min_bb=3,
                          num_bb=8)
    ds = ItmEvalDataset(txt_db, img_db, mini_batch_size=5)
    t_bucket, r_bucket = ds.bucket_hint()

    b0 = ds.get_batches(0, t_bucket, r_bucket)[0]
    jb0 = {k: jnp.asarray(v) for k, v in b0.items()
           if isinstance(v, np.ndarray)}
    params = model.init({"params": jax.random.PRNGKey(0)}, jb0, False)[
        "params"]

    predict = jax.jit(lambda p, b: model.apply({"params": p}, b, False))
    ref_mat, ref_ids = inference_score_matrix(
        predict, ds, params, t_bucket, r_bucket)
    # tile sizes that do NOT divide n_txt=16 / n_img=8 exercise padding
    mat, ids = fast_score_matrix(model, params, ds, t_bucket, r_bucket,
                                 txt_tile=5, img_tile=3, dtype="float32")
    assert ids == ref_ids
    np.testing.assert_allclose(mat, ref_mat, rtol=1e-5, atol=1e-5)

    # mesh-sharded tiles (text axis over 8 devices) give the same matrix
    from uniter_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=8))
    mat8, ids8 = fast_score_matrix(model, params, ds, t_bucket, r_bucket,
                                   txt_tile=5, img_tile=3, dtype="float32",
                                   mesh=mesh)
    assert ids8 == ref_ids
    np.testing.assert_allclose(mat8, ref_mat, rtol=1e-5, atol=1e-5)

    # mesh-sharded batched scoring (each minibatch's rows spread over the 8
    # devices, with zero-padding to a divisible count) gives the same matrix
    mat_m, ids_m = inference_score_matrix(
        predict, ds, params, t_bucket, r_bucket, mesh=mesh)
    assert ids_m == ref_ids
    np.testing.assert_allclose(mat_m, ref_mat, rtol=1e-5, atol=1e-5)


def test_validate_retrieval_fast_matches_batched_windowed(itm_env):
    """ItmValDataset windowed recall: the fast path (full tiled matrix +
    circular-window readout) equals the reference-style per-window batched
    path — same per-pair scores => same gt ranks (VERDICT r2 #6)."""
    import jax
    import jax.numpy as jnp

    import train_itm
    from uniter_tpu.config import UniterConfig
    from uniter_tpu.data.img_db import DetectFeatDb
    from uniter_tpu.data.itm import ItmValDataset
    from uniter_tpu.data.txt_db import TxtTokDb

    cfg = UniterConfig.from_json_file(itm_env["cfg"], dtype="float32")
    from uniter_tpu.models.itm import UniterForImageTextRetrieval

    model = UniterForImageTextRetrieval(cfg, img_dim=2048)
    txt_db = TxtTokDb(itm_env["txt"], max_txt_len=-1)
    img_db = DetectFeatDb(itm_env["img"], conf_th=0.2, max_bb=8, min_bb=3,
                          num_bb=8)
    ds = ItmValDataset(txt_db, img_db, mini_batch_size=5)
    t_bucket, r_bucket = ds.bucket_hint()

    b0 = ds.get_batches(0, t_bucket, r_bucket)[0]
    jb0 = {k: jnp.asarray(v) for k, v in b0.items()
           if isinstance(v, np.ndarray)}
    params = model.init({"params": jax.random.PRNGKey(0)}, jb0, False)[
        "params"]

    logs_b = train_itm.validate_retrieval(model, params, ds, impl="batched")
    logs_f = train_itm.validate_retrieval(model, params, ds, impl="fast")
    assert set(logs_b) == set(logs_f)
    for k in logs_b:
        assert abs(logs_b[k] - logs_f[k]) < 1e-9, (k, logs_b, logs_f)


def test_train_itm_hard_negatives_resume_matches_continuous(itm_env):
    """Interrupted-and-resumed HN training continues on the batches the
    interrupted run never saw: the driver fast-forwards both mining
    streams and the i/t alternation to state.step. Batch streams must be
    bit-identical; params are compared at fp tolerance (the resumed run's
    freshly placed state compiles a separately laid-out step program, so
    reduction-order noise at ~1e-5 is expected and benign)."""
    import jax

    import train_itm_hard_negatives as hn
    import uniter_tpu.data.loader as loader_mod
    from uniter_tpu.utils.misc import parse_with_config

    def argv(out, n):
        return [
            "--train_txt_db", itm_env["txt"],
            "--train_img_db", itm_env["img"],
            "--val_txt_db", itm_env["txt"], "--val_img_db", itm_env["img"],
            "--model_config", itm_env["cfg"],
            "--output_dir", itm_env["root"] + out,
            "--negative_size", "7", "--hard_neg_size", "3",
            "--num_train_steps", str(n), "--valid_steps", "100",
            "--warmup_steps", "1", "--train_batch_size", "2",
            "--max_bb", "8", "--min_bb", "3", "--inf_minibatch_size", "8",
            "--txt_bucket", "16", "--img_bucket", "8",
            "--dtype", "float32", "--seed", "7",
        ]

    captured = []
    orig_prefetcher = loader_mod.DevicePrefetcher

    class Recording(orig_prefetcher):
        def __init__(self, it, put, depth=2):
            def rec():
                for b in it:
                    captured.append({k: np.array(v) for k, v in b.items()})
                    yield b
            super().__init__(rec(), put, depth)

    loader_mod.DevicePrefetcher = Recording
    try:
        cont = hn.main(
            parse_with_config(hn.get_parser(), argv("/hn_cont", 4)))
        cont_batches = list(captured)
        captured.clear()
        hn.main(parse_with_config(hn.get_parser(), argv("/hn_resume", 2)))
        captured.clear()
        final = hn.main(
            parse_with_config(hn.get_parser(), argv("/hn_resume", 4)))
        res_batches = list(captured)
    finally:
        loader_mod.DevicePrefetcher = orig_prefetcher

    assert int(final.step) == 4
    # the data contract: the resumed stream IS the continuous stream from
    # step 3 on — no batch replayed, none skipped
    assert len(res_batches) >= 2
    for j in range(2):
        a, b = cont_batches[2 + j], res_batches[j]
        assert sorted(a) == sorted(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"step3+{j}:{k}")
    for a, b in zip(jax.tree.leaves(cont.params),
                    jax.tree.leaves(final.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
