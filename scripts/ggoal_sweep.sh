#!/bin/bash
# g_goal sensitivity study on UNTEXTURED ShapeStacks (VERDICT r3 #5).
#
# The r3 untextured run (default g_goal 0.5655) reached the GECO goal by
# ~50k, beta ramped, and segmentation collapsed (val ARI-FG-r peak 0.639
# @50k -> FINAL-150k 0.474).  Reference precedent for per-dataset goals:
# /root/reference/README.md:140 (Sketchy needs --g_goal 0.5645).  This
# sweep trains the same data/recipe at three harder goals to show the
# collapse is a g_goal sensitivity, not a data property:
#   0.5635 @150k, 0.5615 @150k (past the original ramp), 0.5595 @50k
# then runs the 320-image batch-1 seg-metrics protocol on FINAL and the
# ckpt-37500 midpoint (same ckpt the original run was probed at).
set -u
cd /root/repo
RES=/tmp/ggoal
EV=evidence/ggoal_sweep
mkdir -p "$RES" "$EV"

run_one () {
  local name=$1 goal=$2 iters=$3
  echo "=== $name (g_goal=$goal, ${iters} iters) $(date) ==="
  python train.py \
    --data_config genesis_tpu/data/shapestacks_config.py \
    --data_folder data/shapestacks-synth-untex \
    --model_config genesis_tpu/models/genesisv2_config.py \
    --run_name "$name" --results_dir "$RES" \
    --train_iter "$iters" --batch_size 32 --g_goal "$goal" \
    --device_dataset --num_workers 0 \
    --report_loss_every 2500 --run_validation_every 12500 \
    --log_images_every 10000000 --N_eval 160 --num_fid_images 320 \
    > "$RES/$name.log" 2>&1
  local rc=$?
  echo "=== $name train exit=$rc $(date) ==="
  mkdir -p "$EV/$name"
  cp "$RES/$name/1/flags.json" "$EV/$name/" 2>/dev/null
  cp "$RES/$name/1/fprint.txt" "$EV/$name/" 2>/dev/null
  cp "$RES/$name/1/scalars.jsonl" "$EV/$name/" 2>/dev/null
  tail -40 "$RES/$name.log" > "$EV/$name/train_tail.log"
}

proto () {
  local name=$1 ckpt=$2
  echo "=== protocol $name $ckpt $(date) ==="
  python scripts/compute_seg_metrics.py \
    --model_dir "$RES/$name/1" --model_file "$ckpt" \
    --split test --batch_size 1 --num_images 320 \
    > "$EV/$name/segm_${ckpt##*-}.log" 2>&1
  tail -8 "$EV/$name/segm_${ckpt##*-}.log"
}

run_one ss_g5635 0.5635 150000
run_one ss_g5615 0.5615 150000
run_one ss_g5595 0.5595 50000

proto ss_g5635 model.ckpt-FINAL
proto ss_g5635 model.ckpt-37500
proto ss_g5615 model.ckpt-FINAL
proto ss_g5615 model.ckpt-37500
proto ss_g5595 model.ckpt-FINAL
proto ss_g5595 model.ckpt-37500
echo "=== sweep done $(date) ==="
