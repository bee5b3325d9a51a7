#!/bin/bash
# Round-5 chain: textured-APC at the GECO equilibrium goal.
#
# apc_tex (textured data, published goal 0.5645) showed the textured
# recon floor sits at ~0.5675 train err_element, so the constraint was
# permanently binding: beta decayed to the 1e-10 floor by 12.5k and
# the KL ran free (4400 nats) — the degenerate regime, not the
# just-binding one that worked on ShapeStacks/CLEVR. This run is the
# fair textured test: goal 0.568 ≈ the measured textured floor, the
# same goal-at-floor recipe that gave the textbook GECO fixed point on
# tetrominoes (0.5675) and Sketchy (0.573). Completes the 2x2:
# {untextured, textured} x {published goal, equilibrium goal}.
#
# Waits for the r5 apc_tex/tetro queue (pid in /tmp/r5q.pid) to exit
# before touching the TPU.
set -u
cd /root/repo
RES=/tmp/r5
EV=evidence/r5_ggoal
mkdir -p "$RES" "$EV"

if [ -f /tmp/r5q.pid ]; then
  while kill -0 "$(cat /tmp/r5q.pid)" 2>/dev/null; do sleep 30; done
fi

name=apc_tex_g568
echo "=== $name (50000 iters) $(date) ==="
python train.py \
  --model_config genesis_tpu/models/genesisv2_config.py \
  --run_name "$name" --results_dir "$RES" \
  --train_iter 50000 --batch_size 32 \
  --device_dataset --num_workers 0 \
  --report_loss_every 2500 --run_validation_every 12500 \
  --log_images_every 10000000 --N_eval 160 --num_fid_images 320 \
  --data_config genesis_tpu/data/apc_config.py \
  --data_folder data/apc-synth-tex \
  --g_goal 0.568 > "$RES/$name.log" 2>&1
echo "=== $name train exit=$? $(date) ==="
mkdir -p "$EV/$name"
cp "$RES/$name/1/flags.json" "$RES/$name/1/fprint.txt" \
   "$RES/$name/1/scalars.jsonl" "$EV/$name/" 2>/dev/null
tail -40 "$RES/$name.log" > "$EV/$name/train_tail.log"
python scripts/compute_seg_metrics.py \
  --model_dir "$RES/$name/1" --model_file model.ckpt-FINAL \
  --split test --batch_size 1 --num_images 320 \
  > "$EV/$name/segm_final.log" 2>&1
tail -10 "$EV/$name/segm_final.log"
echo "=== $name done $(date) ==="
