"""VQA answer vocabulary (the reference's in-tree utils/ans2label.json,
referenced by train_vqa.py:107-108 and inf_vqa.py:45-47).

The shipped ``ans2label.json`` is a DATA artifact, not code: a 3129-entry
answer->label map derived from the VQA v2 train+val annotations (answers
with >= 9 occurrences after the standard normalization). Its label
ordering is load-bearing — the released UNITER VQA checkpoints' 3129-way
output head is indexed by exactly this map, so it must ship verbatim for
checkpoint compatibility. ``scripts/make_ans2label.py`` regenerates a map
with the same algorithm from raw annotations (for new datasets / vocab
sizes; a regenerated map trains fine but is NOT index-compatible with the
released heads unless the annotation iteration order matches).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

DEFAULT_PATH = os.path.join(os.path.dirname(__file__), "ans2label.json")


def default_ans2label_path() -> Optional[str]:
    """Path of the in-tree answer vocabulary (None if absent)."""
    return DEFAULT_PATH if os.path.exists(DEFAULT_PATH) else None


def load_ans2label(path: Optional[str] = None) -> Dict[str, int]:
    """Load an answer->label map; ``None`` resolves to the in-tree
    artifact (the reference hardcodes its own copy, train_vqa.py:107)."""
    path = path or default_ans2label_path()
    if path is None:
        raise FileNotFoundError(
            "no ans2label.json: pass --ans2label or regenerate the "
            "in-tree artifact with scripts/make_ans2label.py")
    with open(path) as f:
        d = json.load(f)
    return {str(k): int(v) for k, v in d.items()}
