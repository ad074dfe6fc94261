"""Device-resident tiled retrieval scoring — the TPU-native redesign of the
reference's ItmEvalDataset + inference loop (reference data/itm.py:454-468,
utils/itm_eval.py:93-114).

The reference rebuilds a host-side batch for every (text, image-window)
pair: for |txt| x |img| scoring that is O(n_txt * n_img) feature fetches and
collates, and the GPU waits on the host. Here the corpus is placed on device
ONCE and one jitted tile function scores a (txt_tile x img_tile) block of
pairs per call by broadcasting the two tiles against each other — the host
does no per-pair work at all, and every forward is a full
(txt_tile * img_tile)-pair batch.

Forward-only structure (r5) — two scoring-specific cuts over the train
forward, together ~10% of the pair FLOPs:

  * **Pre-embedded corpus.** Text and image embeddings are pure per-item
    functions (no cross-modal term before the encoder), so each text/image
    is embedded ONCE instead of once per pair: the tile assembles
    ``[txt_emb ; img_emb]`` directly in token space. This also drops the
    raw [n_img, R, 2048] features from HBM (the embedded corpus is
    H-dim, ~2.7x smaller at base).
  * **CLS-only final layer.** Every retrieval head consumes only
    ``hidden[:, 0]`` (pooler -> rank_output, reference model/itm.py:33-44),
    so the last layer runs as BertLayerCLS (models/encoder.py): a [1, S]
    query slab instead of [S, S] attention, FFN on one row. The encoder
    scan covers layers [0, L-1); the last layer's slice of the stacked scan
    params binds BertLayerCLS directly (identical param layout).

Both cuts are exact rewrites of the same math (parity-tested against the
batched scorer in tests/test_e2e_more.py); ``UNITER_ITM_CLS_PATH=0``
restores the whole-model tile path for A/B runs.
"""

from __future__ import annotations

import os

import numpy as np


def build_eval_arrays(eval_ds, t_bucket: int, r_bucket: int):
    """Materialize the dataset as dense arrays.

    Returns (txt_ids [n_txt, T] int32, txt_len [n_txt], img_feat
    [n_img, R, D] fp32, img_pos [n_img, R, 7], img_nbb [n_img]) with rows
    ordered as eval_ds.ids / eval_ds.all_img_ids.
    """
    n_txt = len(eval_ds.ids)
    txt_ids = np.zeros((n_txt, t_bucket), np.int32)
    txt_len = np.zeros((n_txt,), np.int32)
    for i in range(n_txt):
        ids = np.asarray(
            eval_ds.txt_db.combine_inputs(eval_ds.example(i)["input_ids"]),
            np.int32)
        tl = min(len(ids), t_bucket)
        txt_ids[i, :tl] = ids[:tl]
        txt_len[i] = tl
    imgs = eval_ds.all_img_ids
    n_img = len(imgs)
    feat0, _, _ = eval_ds.img_db.get_img_feat(imgs[0])
    d = feat0.shape[1]
    img_feat = np.zeros((n_img, r_bucket, d), np.float32)
    img_pos = np.zeros((n_img, r_bucket, 7), np.float32)
    img_nbb = np.zeros((n_img,), np.int32)
    for j, name in enumerate(imgs):
        feat, pos7, _ = eval_ds.img_db.get_img_feat(name)
        nb = min(feat.shape[0], r_bucket)
        img_feat[j, :nb] = feat[:nb]
        img_pos[j, :nb] = pos7[:nb]
        img_nbb[j] = nb
    return txt_ids, txt_len, img_feat, img_pos, img_nbb


def _pad_rows(a, mult):
    """Pad axis 0 to a multiple of ``mult`` by repeating row 0."""
    pad = (-a.shape[0]) % mult
    return np.concatenate([a, np.repeat(a[:1], pad, 0)]) if pad else a


def _tile_rows(a, i, n):
    """Row block ``a[i:i+n]`` of a device array, with the 8-byte slice
    index-scalar upload exempted from any caller transfer guard (the
    scoring loops run under ``disallow`` in tests to prove the params and
    corpus are never re-uploaded per call; jit dispatch stays guarded)."""
    import jax

    with jax.transfer_guard_host_to_device("allow"):
        return a[i:i + n]


class _Scorer:
    """Scoring-path modules + param split for one trained retrieval model.

    Splits the trained params into an (L-1)-layer trunk (embeddings +
    encoder scan + heads) and the final layer's slice, bound to
    BertLayerCLS. Falls back to whole-model tile scoring when the encoder
    has < 2 layers or ``UNITER_ITM_CLS_PATH=0``.
    """

    def __init__(self, model, params):
        import jax
        from uniter_tpu.models.encoder import BertLayerCLS, UniterModel

        cfg = model.config
        n_layers = cfg.num_hidden_layers
        self.model, self.params = model, params
        self.split = (n_layers >= 2
                      and os.environ.get("UNITER_ITM_CLS_PATH", "1") == "1")
        # inference-only attn batch-block override: rate=0 drops the
        # dropout-replay buffers (ops/attention.py n_bufs 7 -> 4), so the
        # scoring trunk can afford bigger blocks than training
        bb = int(os.environ.get("UNITER_ITM_ATTN_BB",
                                cfg.attn_batch_block))
        body_cfg = cfg.replace(attn_batch_block=bb)
        if self.split:
            body_cfg = body_cfg.replace(
                num_hidden_layers=n_layers - 1,
                scan_unroll=max(1, min(cfg.scan_unroll, n_layers - 1)))
        self.trunk = UniterModel(body_cfg, model.img_dim)
        self.cls_layer = BertLayerCLS(cfg)
        if self.split:
            stack = params["uniter"]["encoder"]["layer"]["bert_layer"]
            # one-time setup slicing: eager indexing ships its start
            # scalars to device, which callers running the scoring LOOP
            # under a host->device transfer guard must not see flagged
            with jax.transfer_guard_host_to_device("allow"):
                body_enc = {"layer": {"bert_layer": jax.tree_util.tree_map(
                    lambda x: x[:n_layers - 1], dict(stack))}}
                self.trunk_params = {**dict(params["uniter"]),
                                     "encoder": body_enc}
                self.last_params = jax.tree_util.tree_map(
                    lambda x: x[n_layers - 1], dict(stack))
        else:
            self.trunk_params = dict(params["uniter"])
            self.last_params = None
        pool = params["uniter"]["pooler"]["dense"]
        rank = params["rank_output"]
        self.heads = (pool["kernel"], pool["bias"],
                      rank["kernel"], rank["bias"])

        def embed_txt(m, ids):
            import jax.numpy as jnp
            pos = jnp.broadcast_to(
                jnp.arange(ids.shape[1], dtype=jnp.int32), ids.shape)
            return m.embeddings(ids, pos)

        def embed_img(m, feat, pos):
            import jax.numpy as jnp
            type_emb = m.embeddings.token_type_embeddings(
                jnp.ones(feat.shape[:2], jnp.int32))
            return m.img_embeddings(feat, pos, type_emb)

        # params travel as jit ARGUMENTS (not closure constants): constants
        # would be re-hashed per trace and baked into the executable
        self._embed_txt = jax.jit(lambda tp, ids: self.trunk.apply(
            {"params": tp}, ids, method=embed_txt))
        self._embed_img = jax.jit(lambda tp, feat, pos: self.trunk.apply(
            {"params": tp}, feat, pos, method=embed_img))

    def embed_txt(self, ids):
        return self._embed_txt(self.trunk_params, ids)

    def embed_img(self, feat, pos):
        return self._embed_img(self.trunk_params, feat, pos)

    def _score_rows(self, tp, lp, heads, emb, mask):
        """[B] rank scores from assembled joint embeddings + 0/1 mask."""
        import jax.numpy as jnp
        from uniter_tpu.models.encoder import UniterModel, attn_bias

        hidden = self.trunk.apply({"params": tp}, emb, mask,
                                  method=UniterModel.encode)
        if self.split:
            cls = self.cls_layer.apply(
                {"params": lp}, hidden, attn_bias(mask))[:, 0]
        else:
            cls = hidden[:, 0]
        pk, pb, rk, rb = heads
        pooled = jnp.tanh(jnp.dot(cls, pk.astype(cls.dtype))
                          + pb.astype(cls.dtype))
        s = jnp.dot(pooled, rk.astype(pooled.dtype)) + rb.astype(pooled.dtype)
        return s.astype(jnp.float32)[:, 0]

    def tile_fn(self):
        """jitted (txt_emb [ct,T,H], t_mask [ct,T], img_emb [ci,R,H],
        i_mask [ci,R]) -> [ct, ci] scores: the full ct x ci cross product."""
        import jax
        import jax.numpy as jnp

        def f(tp, lp, heads, t_emb, t_mask, i_emb, i_mask):
            ct, ci = t_emb.shape[0], i_emb.shape[0]
            emb = jnp.concatenate(
                [jnp.repeat(t_emb, ci, axis=0),
                 jnp.tile(i_emb, (ct, 1, 1))], axis=1)
            mask = jnp.concatenate(
                [jnp.repeat(t_mask, ci, axis=0),
                 jnp.tile(i_mask, (ct, 1))], axis=1)
            return self._score_rows(tp, lp, heads, emb, mask).reshape(ct, ci)

        jf = jax.jit(f)
        return lambda *a: jf(self.trunk_params, self.last_params,
                             self.heads, *a)

    def window_fn(self, bs):
        """jitted (txt_emb [ct,T,H], t_mask, w_idx [ct,bs], img_emb_all,
        imask_all) -> [ct, bs]: each text against its gathered window."""
        import jax
        import jax.numpy as jnp

        def f(tp, lp, heads, t_emb, t_mask, w_idx, i_emb_all, imask_all):
            ct = t_emb.shape[0]
            idx = w_idx.reshape(-1)  # [ct*bs]
            emb = jnp.concatenate(
                [jnp.repeat(t_emb, bs, axis=0), i_emb_all[idx]], axis=1)
            mask = jnp.concatenate(
                [jnp.repeat(t_mask, bs, axis=0), imask_all[idx]], axis=1)
            return self._score_rows(tp, lp, heads, emb, mask).reshape(ct, bs)

        jf = jax.jit(f)
        return lambda *a: jf(self.trunk_params, self.last_params,
                             self.heads, *a)

    def embed_img_corpus(self, img_feat, img_pos, chunk, put):
        """Embed the image corpus in ``chunk``-row jit calls (one compiled
        program regardless of corpus size) -> [n_pad, R, H] device array.
        The raw 2048-d features never become HBM-resident."""
        import jax.numpy as jnp

        feat_p = _pad_rows(img_feat, chunk)
        pos_p = _pad_rows(img_pos, chunk)
        parts = [self.embed_img(put(feat_p[j:j + chunk]),
                                put(pos_p[j:j + chunk]))
                 for j in range(0, feat_p.shape[0], chunk)]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)


def fast_score_matrix(model, params, eval_ds, t_bucket, r_bucket, *,
                      txt_tile: int = 32, img_tile: int = 128,
                      shard_index: int = 0, shard_count: int = 1,
                      dtype="bfloat16", mesh=None):
    """[n_txt_shard, n_img] rank-score matrix + the shard's txt ids.

    Texts are sharded across processes by stride (reference
    utils/itm_eval.py:99: rows sharded by rank). ``dtype`` is the compute
    dtype for the device-resident features (bf16 halves HBM/transfer).
    With a ``mesh``, each tile's text axis is additionally sharded over the
    mesh's data axis, so all local chips score pairs concurrently
    (pairs/s/chip is compute-bound at ~5k for uniter-base; multi-chip is
    the scaling axis for COCO-size evals). Default tile = 4096 pairs/call
    (32 x 128): r3 sweep at 512x512 corpus shapes — 4192 pairs/s vs 4013
    at 2048 (32x64) and 4119 at 8192 (64x128); a WIDE image axis beats a
    tall text axis at equal pair count (larger img_tile builds the tile
    batch from fewer distinct text rows).
    """
    import jax
    import jax.numpy as jnp

    n_dev = mesh.shape["data"] if mesh is not None else 1
    txt_tile = max(txt_tile, n_dev)
    txt_tile += (-txt_tile) % n_dev  # divisible by the data axis

    txt_ids, txt_len, img_feat, img_pos, img_nbb = build_eval_arrays(
        eval_ds, t_bucket, r_bucket)
    my_rows = np.arange(shard_index, len(txt_ids), shard_count)
    n_txt, n_img = len(my_rows), img_feat.shape[0]
    if n_txt == 0:
        return np.zeros((0, n_img), np.float32), []

    # pad to tile multiples (extra rows repeat row 0; trimmed at the end)
    t_sel = _pad_rows(txt_ids[my_rows], txt_tile)
    tlen_sel = _pad_rows(txt_len[my_rows], txt_tile)
    nbb_p = _pad_rows(img_nbb, img_tile)

    cdt = jnp.dtype(dtype)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        txt_sh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
    else:
        txt_sh = rep = None

    def put(a, sh):
        return jax.device_put(a, sh) if sh is not None else jax.device_put(a)

    # commit params ONCE (replicated): checkpoint-loaded params arrive as
    # host numpy and would otherwise re-upload the full tree on EVERY tile
    # call — at 5k x 1k that is ~1256 tiles x ~full-model bytes through the
    # host->device link (observed: 130GB of host staging, OOM) instead of
    # one placement. Device-resident leaves pass through untouched.
    params = jax.tree.map(
        lambda x: put(x, rep) if isinstance(x, np.ndarray) else x, params)
    scorer = _Scorer(model, params)
    d_txt = put(t_sel, txt_sh)
    d_tmask = put(
        (np.arange(t_bucket)[None] < tlen_sel[:, None]).astype(np.int32),
        txt_sh)
    d_imask = put(
        (np.arange(r_bucket)[None] < nbb_p[:, None]).astype(np.int32), rep)
    # image corpus embedded once, H-dim resident (replicated across chips)
    d_img_emb = scorer.embed_img_corpus(
        img_feat.astype(cdt), img_pos.astype(cdt), img_tile,
        lambda a: put(a, rep))

    ct, ci = txt_tile, img_tile
    tile_jit = scorer.tile_fn()
    out = np.zeros((t_sel.shape[0], nbb_p.shape[0]), np.float32)
    for ti in range(0, t_sel.shape[0], ct):
        # each text tile embedded once, reused across every image tile
        t_emb = scorer.embed_txt(_tile_rows(d_txt, ti, ct))
        for ij in range(0, nbb_p.shape[0], ci):
            out[ti:ti + ct, ij:ij + ci] = np.asarray(tile_jit(
                t_emb, _tile_rows(d_tmask, ti, ct),
                _tile_rows(d_img_emb, ij, ci), _tile_rows(d_imask, ij, ci)))
    mat = out[:n_txt, :n_img]
    return mat, [eval_ds.ids[i] for i in my_rows]


def fast_windowed_scores(model, params, val_ds, t_bucket, r_bucket, *,
                         txt_chunk: int = 8, dtype="bfloat16", mesh=None,
                         shard_index: int = 0, shard_count: int = 1):
    """[n_txt_shard, bs] window score rows (gt at column 0) + shard txt
    ids — the device-resident form of ItmValDataset's windowed validation
    (data/itm.py _window; reference train_itm_hard_negatives.py:268-310).

    Unlike scoring the full matrix and reading windows out of it, this
    computes ONLY each text's bs window pairs (n_img/bs times less work —
    ~12.5x on the COCO HN config): the embedded image corpus lives on
    device once and each jitted call gathers ``txt_chunk`` texts' circular
    windows from it by index, scoring txt_chunk x bs pairs. With a
    ``mesh``, the text-chunk axis shards over the local chips."""
    import jax
    import jax.numpy as jnp

    n_dev = mesh.shape["data"] if mesh is not None else 1
    txt_chunk = max(txt_chunk, n_dev)
    txt_chunk += (-txt_chunk) % n_dev

    txt_ids, txt_len, img_feat, img_pos, img_nbb = build_eval_arrays(
        val_ds, t_bucket, r_bucket)
    my_rows = np.arange(shard_index, len(txt_ids), shard_count)
    n_txt, n_img, bs = len(my_rows), img_feat.shape[0], val_ds.bs
    if n_txt == 0:
        return np.zeros((0, bs), np.float32), []
    # circular window positions per text (gt first — data/itm.py _window)
    js = np.asarray([val_ds._img_pos[val_ds.txt2img[val_ds.ids[i]]]
                     for i in my_rows])
    win = (js[:, None] + np.arange(bs)[None, :]) % n_img  # [n_txt, bs]

    t_sel = _pad_rows(txt_ids[my_rows], txt_chunk)
    tlen_sel = _pad_rows(txt_len[my_rows], txt_chunk)
    win_p = _pad_rows(win, txt_chunk).astype(np.int32)

    cdt = jnp.dtype(dtype)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        txt_sh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
    else:
        txt_sh = rep = None

    def put(a, sh):
        return jax.device_put(a, sh) if sh is not None else jax.device_put(a)

    # commit params once — same contract as fast_score_matrix
    params = jax.tree.map(
        lambda x: put(x, rep) if isinstance(x, np.ndarray) else x, params)
    scorer = _Scorer(model, params)
    d_txt = put(t_sel, txt_sh)
    d_tmask = put(
        (np.arange(t_bucket)[None] < tlen_sel[:, None]).astype(np.int32),
        txt_sh)
    d_win = put(win_p, txt_sh)
    d_imask = put(
        (np.arange(r_bucket)[None] < img_nbb[:, None]).astype(np.int32),
        rep)
    d_img_emb = _tile_rows(scorer.embed_img_corpus(
        img_feat.astype(cdt), img_pos.astype(cdt), max(n_img, 1),
        lambda a: put(a, rep)), 0, n_img)

    ct = txt_chunk
    chunk_jit = scorer.window_fn(bs)
    out = np.zeros((t_sel.shape[0], bs), np.float32)
    for ci in range(0, t_sel.shape[0], ct):
        t_emb = scorer.embed_txt(_tile_rows(d_txt, ci, ct))
        out[ci:ci + ct] = np.asarray(chunk_jit(
            t_emb, _tile_rows(d_tmask, ci, ct), _tile_rows(d_win, ci, ct),
            d_img_emb, d_imask))
    return out[:n_txt], [val_ds.ids[i] for i in my_rows]
