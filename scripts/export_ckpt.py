"""Export trained flax params to a reference-format torch .pt state dict
(the inverse of the import path; reference scripts/convert_ckpt.py only
renamed bert->uniter). Usage:

    python scripts/export_ckpt.py <model_step_N.msgpack-or-train_dir> out.pt

Reads the weights-only msgpack export (utils/save.py) — pass either the
file or a training output_dir (latest checkpoint is used).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(src: str, dst: str):
    import numpy as np
    import torch
    from flax import serialization

    from uniter_tpu.models.checkpoint import export_state_dict

    if os.path.isdir(src):
        # resolve the latest snapshot WITHOUT instantiating an Orbax
        # manager (TrainStateSaver would mkdir <src>/ckpt in a read-only
        # export path)
        from uniter_tpu.training.infer import resolve_ckpt

        src = resolve_ckpt(src)
    with open(src, "rb") as f:
        params = serialization.msgpack_restore(f.read())
    sd = export_state_dict(params)
    torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}
    torch.save(torch_sd, dst)
    print(f"wrote {len(torch_sd)} tensors to {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
