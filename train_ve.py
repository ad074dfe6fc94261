"""SNLI-VE fine-tuning driver (reference train_ve.py) — the VQA driver with
3 answers and the VE datasets (reference model/ve.py, data/ve.py)."""

from __future__ import annotations

import train_vqa
from uniter_tpu.utils.misc import parse_with_config


def get_parser():
    parser = train_vqa.get_parser()
    parser.set_defaults(num_answer=3, learning_rate=8e-5,
                        num_train_steps=4000, warmup_steps=400)
    return parser


main = train_vqa.main

if __name__ == "__main__":
    main(parse_with_config(get_parser()))
