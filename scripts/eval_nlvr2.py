"""Official NLVR2 metrics: accuracy + consistency.

Behavior-compatible with the reference's scripts/eval_nlvr2.py (itself the
official NLVR2 evaluator): consistency groups examples by identifier with
the pair index blanked ("split-####--#.png") and requires every prediction
in a group to be correct.

Usage: python scripts/eval_nlvr2.py <output.csv> <annotation.json(l)>
"""

from __future__ import annotations

import json
import sys
from typing import Dict, List, Tuple


def load_predictions(csv_path: str) -> Dict[str, str]:
    preds = {}
    with open(csv_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            identifier, prediction = line.split(",", 1)
            preds[identifier] = prediction
    return preds


def evaluate(predictions: Dict[str, str],
             labeled: List[dict]) -> Tuple[float, float]:
    missing = [ex["identifier"] for ex in labeled
               if ex["identifier"] not in predictions]
    if missing:
        raise ValueError(f"missing predictions for {len(missing)} items, "
                         f"e.g. {missing[:3]}")
    num_correct = 0
    consistency: Dict[str, bool] = {}
    for ex in labeled:
        parts = ex["identifier"].split("-")
        parts[2] = ""
        group = "-".join(parts)
        consistency.setdefault(group, True)
        if predictions[ex["identifier"]].lower() == ex["label"].lower():
            num_correct += 1
        else:
            consistency[group] = False
    acc = num_correct / len(labeled)
    cons = sum(consistency.values()) / len(consistency)
    return acc, cons


def main(csv_path: str, ann_path: str):
    preds = load_predictions(csv_path)
    with open(ann_path) as f:
        labeled = [json.loads(line) for line in f if line.strip()]
    acc, cons = evaluate(preds, labeled)
    print(f"accuracy={acc}")
    print(f"consistency={cons}")
    return acc, cons


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
