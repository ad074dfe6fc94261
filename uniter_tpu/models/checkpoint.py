"""Checkpoint import: torch ``.pt`` state dicts -> flax param pytrees.

Implements the reference's exact ``from_pretrained`` key-mapping contract
(/root/reference/model/model.py:148-214):

  * ``gamma``/``beta`` -> ``weight``/``bias`` rename (:166-176)
  * ``bert.`` prefix stripping when the target has no ``bert`` submodule
    (:196-199), plus the ``bert -> uniter`` rename of
    scripts/convert_ckpt.py:1-13
  * missing keys are left at fresh-init values; missing/unexpected keys are
    reported, errors only on shape mismatch

and the flax-side layout transforms:

  * ``nn.Linear.weight`` [out, in] -> Dense ``kernel`` [in, out] (transpose)
  * per-layer ``encoder.layer.{i}.*`` tensors -> scan-stacked ``[L, ...]``
    arrays under ``encoder/layer/bert_layer/*``
  * post-load surgeries (type-embedding widening, word-embedding widening,
    rank-head init) used by task models (reference model/nlvr2.py:26-34,
    model/vcr.py:32-50, model/itm.py:25-28).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

# flax path (relative to the UniterModel root) -> (torch key, kind)
# kind: "linear_w" transpose, "raw" as-is.
_STATIC_MAP = {
    "embeddings/word_embeddings/embedding": ("embeddings.word_embeddings.weight", "raw"),
    "embeddings/position_embeddings/embedding": ("embeddings.position_embeddings.weight", "raw"),
    "embeddings/token_type_embeddings/embedding": ("embeddings.token_type_embeddings.weight", "raw"),
    "embeddings/LayerNorm/weight": ("embeddings.LayerNorm.weight", "raw"),
    "embeddings/LayerNorm/bias": ("embeddings.LayerNorm.bias", "raw"),
    "img_embeddings/img_linear/kernel": ("img_embeddings.img_linear.weight", "linear_w"),
    "img_embeddings/img_linear/bias": ("img_embeddings.img_linear.bias", "raw"),
    "img_embeddings/img_layer_norm/weight": ("img_embeddings.img_layer_norm.weight", "raw"),
    "img_embeddings/img_layer_norm/bias": ("img_embeddings.img_layer_norm.bias", "raw"),
    "img_embeddings/pos_linear/kernel": ("img_embeddings.pos_linear.weight", "linear_w"),
    "img_embeddings/pos_linear/bias": ("img_embeddings.pos_linear.bias", "raw"),
    "img_embeddings/pos_layer_norm/weight": ("img_embeddings.pos_layer_norm.weight", "raw"),
    "img_embeddings/pos_layer_norm/bias": ("img_embeddings.pos_layer_norm.bias", "raw"),
    "img_embeddings/mask_embedding": ("img_embeddings.mask_embedding.weight", "raw"),
    "img_embeddings/LayerNorm/weight": ("img_embeddings.LayerNorm.weight", "raw"),
    "img_embeddings/LayerNorm/bias": ("img_embeddings.LayerNorm.bias", "raw"),
    "pooler/dense/kernel": ("pooler.dense.weight", "linear_w"),
    "pooler/dense/bias": ("pooler.dense.bias", "raw"),
}

# Per-layer tensors, to be stacked along axis 0 over layers.
# flax subpath under encoder/layer/bert_layer -> (torch subkey, kind)
_LAYER_MAP = {
    "attention/query/kernel": ("attention.self.query.weight", "linear_w"),
    "attention/query/bias": ("attention.self.query.bias", "raw"),
    "attention/key/kernel": ("attention.self.key.weight", "linear_w"),
    "attention/key/bias": ("attention.self.key.bias", "raw"),
    "attention/value/kernel": ("attention.self.value.weight", "linear_w"),
    "attention/value/bias": ("attention.self.value.bias", "raw"),
    "attention/output_dense/kernel": ("attention.output.dense.weight", "linear_w"),
    "attention/output_dense/bias": ("attention.output.dense.bias", "raw"),
    "attention/output_LayerNorm/weight": ("attention.output.LayerNorm.weight", "raw"),
    "attention/output_LayerNorm/bias": ("attention.output.LayerNorm.bias", "raw"),
    "intermediate_dense/kernel": ("intermediate.dense.weight", "linear_w"),
    "intermediate_dense/bias": ("intermediate.dense.bias", "raw"),
    "output_dense/kernel": ("output.dense.weight", "linear_w"),
    "output_dense/bias": ("output.dense.bias", "raw"),
    "output_LayerNorm/weight": ("output.LayerNorm.weight", "raw"),
    "output_LayerNorm/bias": ("output.LayerNorm.bias", "raw"),
}


def normalize_state_dict(state_dict: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """gamma/beta rename + bert./uniter. prefix stripping + numpy-ify.

    Returns keys relative to the UniterModel root (i.e. ``embeddings.*``,
    ``encoder.*``, ...) plus any task-head keys left as-is.
    """
    out = {}
    for key, val in state_dict.items():
        k = key.replace("gamma", "weight").replace("beta", "bias")
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        out[k] = arr.astype(np.float32) if arr.dtype == np.float16 else arr
    # The released checkpoints prefix the trunk with "uniter." (task models)
    # or "bert." (converted BERT init, scripts/convert_ckpt.py).
    for prefix in ("uniter.", "bert."):
        if any(k.startswith(prefix) for k in out):
            out = {
                (k[len(prefix):] if k.startswith(prefix) else k): v
                for k, v in out.items()
            }
            break
    return out


def _convert(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "linear_w":
        return np.ascontiguousarray(arr.T)
    return arr


def uniter_params_from_state_dict(
    state_dict: Dict[str, np.ndarray],
    num_layers: int,
) -> Tuple[Dict[str, Any], List[str], List[str]]:
    """Build the UniterModel param subtree from a normalized state dict.

    Returns (flat_params {path: array}, missing_keys, consumed_torch_keys).
    """
    flat: Dict[str, np.ndarray] = {}
    missing: List[str] = []
    consumed: List[str] = []

    for path, (tkey, kind) in _STATIC_MAP.items():
        if tkey in state_dict:
            flat[path] = _convert(state_dict[tkey], kind)
            consumed.append(tkey)
        else:
            missing.append(path)

    for subpath, (tsub, kind) in _LAYER_MAP.items():
        per_layer = []
        ok = True
        for i in range(num_layers):
            tkey = f"encoder.layer.{i}.{tsub}"
            if tkey not in state_dict:
                ok = False
                break
            per_layer.append(_convert(state_dict[tkey], kind))
            consumed.append(tkey)
        if ok:
            flat[f"encoder/layer/bert_layer/{subpath}"] = np.stack(per_layer)
        else:
            missing.append(f"encoder/layer/bert_layer/{subpath}")

    return flat, missing, consumed


def unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, arr in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def flatten(tree: Dict[str, Any], prefix="") -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, path))
        else:
            out[path] = v
    return out


def merge_into_params(
    init_params: Dict[str, Any],
    loaded_flat: Dict[str, np.ndarray],
    *,
    prefix: str = "",
    strict_shapes: bool = True,
) -> Tuple[Dict[str, Any], List[str]]:
    """Overlay loaded tensors onto an init param tree (fresh init fills gaps).

    ``prefix`` positions the loaded subtree (e.g. "uniter" for task models
    whose trunk lives under params['uniter']). Returns (params, filled_paths).
    """
    flat_init = flatten(init_params)
    filled = []
    for path, arr in loaded_flat.items():
        full = f"{prefix}/{path}" if prefix else path
        if full not in flat_init:
            logger.info("checkpoint key not used by model: %s", full)
            continue
        want = flat_init[full].shape
        if tuple(arr.shape) != tuple(want):
            msg = f"shape mismatch for {full}: ckpt {arr.shape} vs model {want}"
            if strict_shapes:
                raise ValueError(msg)
            logger.warning("%s — skipped", msg)
            continue
        flat_init[full] = jnp.asarray(arr, dtype=flat_init[full].dtype)
        filled.append(full)
    return unflatten({k: np.asarray(v) for k, v in flat_init.items()}), filled


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt state dict (weights only) and normalize it."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd and all(
        not hasattr(v, "numpy") for k, v in sd.items() if k != "state_dict"
    ):
        sd = sd["state_dict"]
    return normalize_state_dict(sd)


# Pretraining-head keys (reference model/pretrain.py:50-63 module names) ->
# flax paths, for continuing pretraining from released checkpoints.
_PRETRAIN_HEAD_MAP = {
    "cls/transform/dense/kernel": ("cls.predictions.transform.dense.weight", "linear_w"),
    "cls/transform/dense/bias": ("cls.predictions.transform.dense.bias", "raw"),
    "cls/transform/LayerNorm/weight": ("cls.predictions.transform.LayerNorm.weight", "raw"),
    "cls/transform/LayerNorm/bias": ("cls.predictions.transform.LayerNorm.bias", "raw"),
    "cls/bias": ("cls.predictions.bias", "raw"),
    "feat_regress/net_dense/kernel": ("feat_regress.net.0.weight", "linear_w"),
    "feat_regress/net_dense/bias": ("feat_regress.net.0.bias", "raw"),
    "feat_regress/net_ln/weight": ("feat_regress.net.2.weight", "raw"),
    "feat_regress/net_ln/bias": ("feat_regress.net.2.bias", "raw"),
    "feat_regress/bias": ("feat_regress.bias", "raw"),
    "region_classifier/net_dense/kernel": ("region_classifier.net.0.weight", "linear_w"),
    "region_classifier/net_dense/bias": ("region_classifier.net.0.bias", "raw"),
    "region_classifier/net_ln/weight": ("region_classifier.net.2.weight", "raw"),
    "region_classifier/net_ln/bias": ("region_classifier.net.2.bias", "raw"),
    "region_classifier/net_out/kernel": ("region_classifier.net.3.weight", "linear_w"),
    "region_classifier/net_out/bias": ("region_classifier.net.3.bias", "raw"),
    "itm_output/kernel": ("itm_output.weight", "linear_w"),
    "itm_output/bias": ("itm_output.bias", "raw"),
}


def pretrain_head_params_from_state_dict(state_dict):
    """Head tensors for UniterForPretraining (at the params root)."""
    flat = {}
    for path, (tkey, kind) in _PRETRAIN_HEAD_MAP.items():
        if tkey in state_dict:
            flat[path] = _convert(state_dict[tkey], kind)
    return flat


# Fine-tune task-head keys (reference model/{vqa,vcr,nlvr2,itm,re}.py module
# names) -> flax paths, so released/reference fine-tuned .pt checkpoints load
# directly into the task models. Listed as (flax_path, torch_key, kind);
# first matching torch key wins (RE's re_output is a Linear at mlp=1 but a
# Sequential at mlp=2, reference model/re.py:30-35).
_TASK_HEAD_MAP = (
    # VQA / VE: Sequential(Linear, GELU, LayerNorm, Linear) (model/vqa.py:23-28)
    ("vqa_hidden/kernel", "vqa_output.0.weight", "linear_w"),
    ("vqa_hidden/bias", "vqa_output.0.bias", "raw"),
    ("vqa_ln/weight", "vqa_output.2.weight", "raw"),
    ("vqa_ln/bias", "vqa_output.2.bias", "raw"),
    ("vqa_out/kernel", "vqa_output.3.weight", "linear_w"),
    ("vqa_out/bias", "vqa_output.3.bias", "raw"),
    # VCR: Sequential(Linear, ReLU, LayerNorm, Linear) (model/vcr.py:24-29)
    ("vcr_hidden/kernel", "vcr_output.0.weight", "linear_w"),
    ("vcr_hidden/bias", "vcr_output.0.bias", "raw"),
    ("vcr_ln/weight", "vcr_output.2.weight", "raw"),
    ("vcr_ln/bias", "vcr_output.2.bias", "raw"),
    ("vcr_out/kernel", "vcr_output.3.weight", "linear_w"),
    ("vcr_out/bias", "vcr_output.3.bias", "raw"),
    # NLVR2 heads (model/nlvr2.py:51,142-147)
    ("nlvr2_output/kernel", "nlvr2_output.weight", "linear_w"),
    ("nlvr2_output/bias", "nlvr2_output.bias", "raw"),
    ("attn1/in_proj_weight", "attn1.in_proj_weight", "raw"),
    ("attn1/in_proj_bias", "attn1.in_proj_bias", "raw"),
    ("attn1/out_proj/kernel", "attn1.out_proj.weight", "linear_w"),
    ("attn1/out_proj/bias", "attn1.out_proj.bias", "raw"),
    ("attn2/in_proj_weight", "attn2.in_proj_weight", "raw"),
    ("attn2/in_proj_bias", "attn2.in_proj_bias", "raw"),
    ("attn2/out_proj/kernel", "attn2.out_proj.weight", "linear_w"),
    ("attn2/out_proj/bias", "attn2.out_proj.bias", "raw"),
    ("fc_dense/kernel", "fc.0.weight", "linear_w"),
    ("fc_dense/bias", "fc.0.bias", "raw"),
    ("attn_pool/fc/kernel", "attn_pool.fc.0.weight", "linear_w"),
    ("attn_pool/fc/bias", "attn_pool.fc.0.bias", "raw"),
    # ITM / retrieval (model/itm.py:20-22)
    ("itm_output/kernel", "itm_output.weight", "linear_w"),
    ("itm_output/bias", "itm_output.bias", "raw"),
    ("rank_output/kernel", "rank_output.weight", "linear_w"),
    ("rank_output/bias", "rank_output.bias", "raw"),
    # RE (model/re.py:27-35): mlp=2 Sequential first, then mlp=1 Linear
    ("re_hidden/kernel", "re_output.0.weight", "linear_w"),
    ("re_hidden/bias", "re_output.0.bias", "raw"),
    ("re_ln/weight", "re_output.2.weight", "raw"),
    ("re_ln/bias", "re_output.2.bias", "raw"),
    ("re_output/kernel", "re_output.3.weight", "linear_w"),
    ("re_output/bias", "re_output.3.bias", "raw"),
    ("re_output/kernel", "re_output.weight", "linear_w"),
    ("re_output/bias", "re_output.bias", "raw"),
)


def task_head_params_from_state_dict(state_dict):
    """Fine-tune head tensors (at the params root) from a normalized state
    dict; combine with ``uniter_params_from_state_dict`` for the trunk."""
    flat = {}
    for path, tkey, kind in _TASK_HEAD_MAP:
        if tkey in state_dict and path not in flat:
            flat[path] = _convert(state_dict[tkey], kind)
    return flat


def export_state_dict(params: Dict[str, Any], *, trunk: str = "uniter",
                      prefix: str = "uniter.") -> Dict[str, np.ndarray]:
    """Inverse of the import maps: flax params -> reference-format torch-style
    state dict (numpy values), so models trained here can be consumed by
    reference tooling or re-imported. Covers the trunk (incl. un-stacking the
    scanned [L, ...] layer params), the pretraining heads, and the fine-tune
    task heads."""
    flat = flatten(params)
    out: Dict[str, np.ndarray] = {}

    def unconvert(arr, kind):
        arr = np.asarray(arr)
        return np.ascontiguousarray(arr.T) if kind == "linear_w" else arr

    troot = f"{trunk}/" if trunk and trunk in params else ""
    for path, (tkey, kind) in _STATIC_MAP.items():
        full = troot + path
        if full in flat:
            out[prefix + tkey] = unconvert(flat[full], kind)
    for subpath, (tsub, kind) in _LAYER_MAP.items():
        full = f"{troot}encoder/layer/bert_layer/{subpath}"
        if full in flat:
            stacked = np.asarray(flat[full])
            for i in range(stacked.shape[0]):
                out[f"{prefix}encoder.layer.{i}.{tsub}"] = unconvert(
                    stacked[i], kind)
    for path, (tkey, kind) in _PRETRAIN_HEAD_MAP.items():
        if path in flat:
            out[tkey] = unconvert(flat[path], kind)
    two_layer_re = "re_hidden/kernel" in flat
    for path, tkey, kind in _TASK_HEAD_MAP:
        if path not in flat or tkey in out:
            continue
        # RE lists two torch layouts per flax path; emit the Sequential form
        # only when the 2-layer head exists, else the plain Linear
        if tkey.startswith("re_output.3.") and not two_layer_re:
            continue
        if tkey.startswith("re_output.") and "." not in tkey[len("re_output."):] \
                and two_layer_re:
            continue
        out[tkey] = unconvert(flat[path], kind)
    return out


# ---------------------------------------------------------------------------
# Post-load surgeries (reference §5 checkpoint bullet)
# ---------------------------------------------------------------------------


# Widening surgeries (type-row copy for NLVR2/VCR, +81 VCR word rows) are
# applied by training/driver.py:load_trunk_checkpoint while merging the
# checkpoint into freshly initialized params — new rows keep their flax
# init unless the reference copies a specific row (nlvr2.py:29-33,
# vcr.py:35-50).
