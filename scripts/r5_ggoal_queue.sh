#!/bin/bash
# Round-5 g_goal lever runs (VERDICT r4 #2 and #6).
#
# Round 4 proved on untextured ShapeStacks that the GECO goal is the
# lever (0.474 -> 0.903 ARI-FG-r by moving g_goal 0.004). This queue
# applies it to the three protocols the judge flagged:
#   - tetrominoes: err floors at ~0.566 just ABOVE the 0.5655 goal, so
#     the constraint never satisfies and beta climbs forever -> RAISE
#     the goal above the floor (0.5675) so beta can stabilise.
#   - APC: same mechanism, floor ~0.578 vs goal 0.5645 -> raise to
#     0.580 (reference precedent for per-dataset goals: README.md:140).
#   - CLEVR: err AT goal but recon-mask collapse after the beta ramp
#     (0.874@50k -> 0.337@150k recon ARI) — the untextured-ShapeStacks
#     signature -> HARDER goal (0.5625) keeps the err constraint
#     binding so beta never crushes the KL.
# Each run ends with the reference's 320-image batch-1 seg protocol on
# FINAL; evidence copied into evidence/r5_ggoal/.
set -u
cd /root/repo
RES=/tmp/r5
EV=evidence/r5_ggoal
mkdir -p "$RES" "$EV"

gen_data () {
  [ -d data/multi-object-synth/tetrominoes ] || \
    python scripts/generate_tetrominoes_tfrecords.py --n 60000
  [ -d data/multi-object-synth/clevr ] || \
    python scripts/generate_clevr_tfrecords.py --n 30000
  [ -d data/apc-synth ] || python scripts/generate_apc.py
  # The APC loader reads processed/ (resize+crop of training/); the
  # split .txt files must not pre-exist empty or the loader sees 0
  # images (this bit the first queue run).
  [ -d data/apc-synth/processed ] || python -c \
    "from genesis_tpu.data.apc_config import preprocess; \
preprocess('data/apc-synth')"
}

run_one () {
  local name=$1 iters=$2; shift 2
  echo "=== $name (${iters} iters) $(date) ==="
  python train.py \
    --model_config genesis_tpu/models/genesisv2_config.py \
    --run_name "$name" --results_dir "$RES" \
    --train_iter "$iters" --batch_size 32 \
    --device_dataset --num_workers 0 \
    --report_loss_every 2500 --run_validation_every 12500 \
    --log_images_every 10000000 --N_eval 160 --num_fid_images 320 \
    "$@" > "$RES/$name.log" 2>&1
  echo "=== $name train exit=$? $(date) ==="
  mkdir -p "$EV/$name"
  cp "$RES/$name/1/flags.json" "$RES/$name/1/fprint.txt" \
     "$RES/$name/1/scalars.jsonl" "$EV/$name/" 2>/dev/null
  tail -40 "$RES/$name.log" > "$EV/$name/train_tail.log"
  python scripts/compute_seg_metrics.py \
    --model_dir "$RES/$name/1" --model_file model.ckpt-FINAL \
    --split test --batch_size 1 --num_images 320 \
    > "$EV/$name/segm_final.log" 2>&1
  tail -8 "$EV/$name/segm_final.log"
}

gen_data

run_one tetro_g5675 150000 \
  --data_config genesis_tpu/data/multi_object_config.py \
  --data_folder data/multi-object-synth --dataset tetrominoes \
  --g_goal 0.5675

run_one clevr_g5625 50000 \
  --data_config genesis_tpu/data/multi_object_config.py \
  --data_folder data/multi-object-synth --dataset clevr \
  --g_goal 0.5625

run_one apc_g580 50000 \
  --data_config genesis_tpu/data/apc_config.py \
  --data_folder data/apc-synth \
  --g_goal 0.580

echo "=== r5 ggoal queue done $(date) ==="
