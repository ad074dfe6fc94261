"""SNLI-VE dataset aliases (reference data/ve.py: VE = VQA with 3 answers)."""

from uniter_tpu.data.vqa import VeDataset  # noqa: F401

VeEvalDataset = VeDataset
