"""Report static-bucket padding efficiency for a txt_db (+ img_db).

The reference's TokenBucketSampler (data/sampler.py:16-61) packs
dynamically; our static buckets compile one program per (T, R) shape.
This prints the measured trade for a real dataset: compiled program
count, batches per epoch, and token efficiency (real / padded tokens).

    python scripts/bucket_stats.py --txt_db ... --img_db ... \
        --train_batch_size 10240 [--max_txt_len 60]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uniter_tpu.data.buckets import bucket_stats, spec_from_dataset
from uniter_tpu.data.img_db import DetectFeatDb
from uniter_tpu.data.txt_db import TxtTokDb


def main(opts):
    txt_db = TxtTokDb(opts.txt_db, max_txt_len=opts.max_txt_len)
    img_db = DetectFeatDb(
        opts.img_db, conf_th=opts.conf_th, max_bb=opts.max_bb,
        min_bb=opts.min_bb, num_bb=opts.num_bb) if opts.img_db else None

    sizes = []
    for i in txt_db.id2len:
        tl = txt_db.id2len[i]
        nbb = 0
        if img_db is not None:
            f = txt_db.txt2img[i]
            nbb = (sum(img_db.name2nbb[x] for x in f)
                   if isinstance(f, list) else img_db.name2nbb[f])
        sizes.append((tl, nbb))

    class _DS:
        def __len__(self):
            return len(sizes)

        def size_of(self, i):
            return sizes[i]

    spec = spec_from_dataset(_DS(), opts.train_batch_size)
    print(json.dumps(bucket_stats(sizes, spec), indent=2))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--txt_db", required=True)
    p.add_argument("--img_db", default=None)
    p.add_argument("--train_batch_size", type=int, default=10240)
    p.add_argument("--max_txt_len", type=int, default=60)
    p.add_argument("--conf_th", type=float, default=0.2)
    p.add_argument("--max_bb", type=int, default=100)
    p.add_argument("--min_bb", type=int, default=10)
    p.add_argument("--num_bb", type=int, default=36)
    main(p.parse_args())
