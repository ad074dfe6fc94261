"""IPOT/OT parity: our lax.scan implementation vs the reference torch one.

The reference module (model/ot.py) is pure torch (no apex/horovod), so we
import it directly as a numerical oracle when the read-only reference mount
is present.
"""

import importlib.util
import os

import numpy as np
import pytest

import jax.numpy as jnp

from uniter_tpu.ops.ot import optimal_transport_dist

REF = "/root/reference/model/ot.py"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_ot_distance_matches_reference():
    import torch

    spec = importlib.util.spec_from_file_location("ref_ot", REF)
    ref_ot = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_ot)

    rng = np.random.RandomState(0)
    B, M, N, D = 3, 7, 5, 16
    txt = rng.randn(B, M, D).astype(np.float32)
    img = rng.randn(B, N, D).astype(np.float32)
    txt_pad = np.zeros((B, M), bool)
    img_pad = np.zeros((B, N), bool)
    txt_pad[1, 5:] = True
    img_pad[2, 3:] = True

    # The reference's batched trace() uses a uint8 mask, which modern torch
    # rejects; drive its cost/ipot pieces and take the trace with einsum.
    t_txt, t_img = torch.tensor(txt), torch.tensor(img)
    t_tp, t_ip = torch.tensor(txt_pad), torch.tensor(img_pad)
    cost = ref_ot.cost_matrix_cosine(t_txt, t_img)
    joint_pad = t_tp.unsqueeze(-1) | t_ip.unsqueeze(-2)
    cost.masked_fill_(joint_pad, 0)
    txt_len = (t_tp.size(1) - t_tp.sum(dim=1)).to(cost.dtype)
    img_len = (t_ip.size(1) - t_ip.sum(dim=1)).to(cost.dtype)
    T = ref_ot.ipot(cost.detach(), txt_len, t_tp, img_len, t_ip, joint_pad,
                    0.5, 50, 1)
    want = torch.einsum("bmn,bnm->b", cost, T).numpy()
    got = np.asarray(
        optimal_transport_dist(
            jnp.asarray(txt), jnp.asarray(img),
            jnp.asarray(txt_pad), jnp.asarray(img_pad),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
