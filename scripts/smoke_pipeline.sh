#!/usr/bin/env bash
# Full-pipeline smoke drive on the virtual CPU mesh (the verify-skill
# recipe as a runnable): synthetic fixtures -> convert_imgdir -> prepro
# (+ clean-rerun probe) -> train_nlvr2 3 steps -> resume to 5 ->
# inf_nlvr2 -> official eval_nlvr2 -> bogus-train_dir probe.
# Exits nonzero on the first failed stage. ~4 min with a warm compile
# cache. Usage: bash scripts/smoke_pipeline.sh
set -e
export PYTHONPATH= JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" JAX_COMPILATION_CACHE_DIR=/tmp/jax_test_cache
cd "$(dirname "$0")/.."
W=$(mktemp -d)
echo "workdir $W"
python - "$W" << 'EOF'
import json, os, sys
import numpy as np
W = sys.argv[1]
rng = np.random.RandomState(0)
words = ["the","left","image","contains","dog","cat","two","one","red","blue"]
vocab = ["[PAD]","[UNK]","[CLS]","[SEP]","[MASK]","!"] + words
open(os.path.join(W,"vocab.txt"),"w").write("\n".join(vocab))
examples = []
for i in range(8):
    for k in range(2):
        examples.append({"identifier": f"dev-{i:04d}-{k}-0.png",
                         "sentence": " ".join(rng.choice(words, rng.randint(3,7)).tolist()),
                         "label": "True" if (i+k)%2==0 else "False"})
open(os.path.join(W,"dev.json"),"w").write("\n".join(json.dumps(e) for e in examples))
# raw npz dir for convert_imgdir
npz = os.path.join(W,"npz"); os.makedirs(npz)
names = set()
for e in examples:
    iid = e["identifier"][:-6]  # dev-0000-0
    names.update({f"nlvr2_{iid}-img0.png", f"nlvr2_{iid}-img1.png"})
for n in sorted(names):
    nbb = rng.randint(4,9)
    np.savez(os.path.join(npz, n.replace(".png",".npz")),
             features=rng.randn(nbb,2048).astype(np.float16),
             norm_bb=rng.rand(nbb,6).astype(np.float16),
             conf=np.linspace(1,0.3,nbb).astype(np.float16),
             soft_labels=rng.rand(nbb,1601).astype(np.float16))
cfg = dict(vocab_size=len(vocab), hidden_size=48, num_hidden_layers=2,
           num_attention_heads=4, intermediate_size=96,
           max_position_embeddings=64, type_vocab_size=2,
           hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
           hidden_act="gelu", initializer_range=0.02)
json.dump(cfg, open(os.path.join(W,"model.json"),"w"))
EOF
echo "== convert_imgdir =="
python scripts/convert_imgdir.py --img_dir $W/npz --output $W/img_db --conf_th 0.2 --max_bb 10 --min_bb 3 2>&1 | tail -2
echo "== prepro =="
python prepro.py --annotation $W/dev.json --output $W/txt_db --task nlvr --toker $W/vocab.txt 2>&1 | tail -2
echo "== prepro rerun (must fail cleanly) =="
if python prepro.py --annotation $W/dev.json --output $W/txt_db --task nlvr --toker $W/vocab.txt 2>&1 | grep -qi "error\|exists"; then echo "clean-exists OK"; else echo "RERUN PROBE FAILED"; exit 1; fi
echo "== train 3 steps =="
python train_nlvr2.py --train_txt_db $W/txt_db --train_img_db $W/img_db \
  --val_txt_db $W/txt_db --val_img_db $W/img_db --model_config $W/model.json \
  --model paired --output_dir $W/out --train_batch_size 256 --val_batch_size 256 \
  --num_train_steps 3 --valid_steps 3 --warmup_steps 1 --max_bb 10 --min_bb 3 \
  --dtype float32 --seed 3 2>&1 | tail -4
echo "== resume to 5 steps =="
python train_nlvr2.py --train_txt_db $W/txt_db --train_img_db $W/img_db \
  --val_txt_db $W/txt_db --val_img_db $W/img_db --model_config $W/model.json \
  --model paired --output_dir $W/out --train_batch_size 256 --val_batch_size 256 \
  --num_train_steps 5 --valid_steps 5 --warmup_steps 1 --max_bb 10 --min_bb 3 \
  --dtype float32 --seed 3 2>&1 | grep -i "resum" || { echo "RESUME PROBE FAILED"; exit 1; }
echo "== inference =="
python inf_nlvr2.py --txt_db $W/txt_db --img_db $W/img_db --train_dir $W/out \
  --output_dir $W/inf --batch_size 256 2>&1 | tail -2
echo "== official eval =="
python scripts/eval_nlvr2.py $W/inf/results.csv $W/dev.json 2>&1 | tail -2
echo "== bogus train_dir probe =="
if python inf_nlvr2.py --txt_db $W/txt_db --img_db $W/img_db --train_dir /tmp/nonexistent_dir_xyz --output_dir $W/inf2 --batch_size 256 2>&1 | grep -qi "error\|no such\|not found\|missing"; then echo "bogus-dir OK"; else echo "BOGUS PROBE FAILED"; exit 1; fi
echo "DRIVE OK"
