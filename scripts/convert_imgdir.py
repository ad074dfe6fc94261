"""npz feature dir -> img_db (reference scripts/convert_imgdir.py).

Reads Faster-R-CNN npz dumps (features / norm_bb / conf / soft_labels),
downcasts fp32 -> fp16 (:41-46), computes nbb under the conf-threshold rule
(:25), and writes the store + nbb json via uniter_tpu.data.img_db.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from multiprocessing import Pool

import numpy as np

# allow `python scripts/convert_imgdir.py` without an installed package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uniter_tpu.data.img_db import write_img_db  # noqa: E402
from uniter_tpu.utils.logger import LOGGER  # noqa: E402


def load_npz(path):
    name = os.path.basename(path)
    with np.load(path, allow_pickle=True) as z:
        rec = {}
        for k in z.files:
            arr = z[k]
            if arr.dtype == np.float32:
                arr = arr.astype(np.float16)
            rec[k] = arr
    return name, rec


def main(opts):
    paths = sorted(glob.glob(os.path.join(opts.img_dir, "*.npz")))
    LOGGER.info("converting %d npz files", len(paths))
    if opts.num_bb is None:
        opts.num_bb = 100 if opts.conf_th == -1 else 36
    with Pool(opts.nproc) as pool:
        # stream: imap keeps only the in-flight window resident — a full
        # coco split's features are tens of GB and must not be dict'ed up
        # front
        records = pool.imap(load_npz, paths, chunksize=16)
        write_img_db(opts.output, records, conf_th=opts.conf_th,
                     max_bb=opts.max_bb, min_bb=opts.min_bb,
                     num_bb=opts.num_bb,
                     compress=opts.compress and not opts.uncompressed,
                     store_format=opts.store)
    LOGGER.info("wrote img_db to %s", opts.output)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--img_dir", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--conf_th", type=float, default=0.2)
    parser.add_argument("--max_bb", type=int, default=100)
    parser.add_argument("--min_bb", type=int, default=10)
    parser.add_argument("--num_bb", type=int, default=None,
                        help="gt layout store name when --conf_th -1 "
                             "(default 100, matching the readers)")
    parser.add_argument("--nproc", type=int, default=8)
    parser.add_argument("--store", default="lmdb", choices=["lmdb", "dir"],
                        help="record store format (lmdb = a real data.mdb "
                             "via the native streaming builder, the "
                             "reference's on-disk format; dir = one file "
                             "per key for debugging)")
    parser.add_argument("--compress", action="store_true",
                        help="write the *_compressed (npz) store layout "
                             "(reference scripts/convert_imgdir.py:128; "
                             "default matches the released uncompressed "
                             "msgpack DBs)")
    parser.add_argument("--uncompressed", action="store_true",
                        help="deprecated: uncompressed is already the "
                             "default; when given it takes precedence "
                             "over --compress")
    main(parser.parse_args())
