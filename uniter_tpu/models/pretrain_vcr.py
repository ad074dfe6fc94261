"""2nd-stage VCR pretraining model (MLM / MRFR / MRC, no ITM).

Reference: /root/reference/model/pretrain_vcr.py. Identical computation to
UniterForPretraining with ``txt_type_ids`` flowing through the batch dict
(encode_batch already forwards them); the VCR-specific 4-row type table and
+81 special word rows are checkpoint surgeries
(driver.load_trunk_checkpoint widening; reference
pretrain_vcr.py:12-32) combined with a config whose
``type_vocab_size=4`` / ``vocab_size += 81``.
"""

from __future__ import annotations

from uniter_tpu.models.pretrain import UniterForPretraining


class UniterForPretrainingForVCR(UniterForPretraining):
    def __call__(self, batch, task="mlm", compute_loss=True, *,
                 deterministic: bool = False):
        if task.startswith("itm"):
            raise ValueError("VCR 2nd-stage pretraining has no ITM task "
                             "(reference pretrain_vcr.py:43-68)")
        return super().__call__(batch, task, compute_loss,
                                deterministic=deterministic)
