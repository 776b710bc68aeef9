#!/bin/bash
# Round-5 queue, phase 2: runs after the 2v2 re-run completed and the
# on-chip sampling-kernel probe (scripts/probe_sample_kernel.py) passed.
set -u
cd /root/repo
mkdir -p /tmp/r5_logs

run() {
  local name=$1; shift
  echo "=== START $name $(date -u +%H:%M:%S) ==="
  timeout 5400 "$@" >"/tmp/r5_logs/$name.out" 2>&1
  echo "=== DONE  $name rc=$? $(date -u +%H:%M:%S) ==="
}

# gate: the hardware-PRNG sampling branch must be validated on-chip
# before any recorded run samples through it
run probe python scripts/probe_sample_kernel.py
grep -q "MFU" /tmp/r5_logs/probe.out || { echo "PROBE FAILED"; exit 1; }

# --- item 1 (remainder): 50M 3v3 self-play, sampled tau=0.35 eval ---
rm -f docs_train_3v3_r5.jsonl
rm -rf checkpoints/train_3v3
run 3v3 python examples/train_teams.py --team-size 3 --envs 2048 \
    --timesteps 50000000 --log docs_train_3v3_r5.jsonl

# --- item 2: r2-shape learning checks (2048 envs, 49152 ts/iter, 400 it) ---
run plane python scripts/learning_check.py --envs 2048 --iterations 400 \
    --log docs_learning_check_plane_r5.jsonl
run mesh2048 python scripts/learning_check.py --envs 2048 --iterations 400 \
    --mesh --log docs_learning_check_mesh_shape_r5.jsonl
run ab_block1 python scripts/learning_check.py --envs 2048 --iterations 400 \
    --shuffle-block-rows 1 --log docs_ab_shuffle_block1_r5.jsonl
# --- item 4: bf16 rollout inference curve parity at the same shape ---
run bf16 python scripts/learning_check.py --envs 2048 --iterations 400 \
    --bf16-inference --log docs_learning_check_bf16_r5.jsonl

# --- item 3: mesh world >=1M overall steps/s at the r4 check shape ---
run mesh8192 python scripts/learning_check.py --envs 8192 --iterations 200 \
    --ts-base 100000 --mesh --bf16-inference \
    --log docs_learning_check_mesh_r5.jsonl

# --- item 6: training demonstrations in the three non-soccar modes ---
run hoops python examples/train_1v1.py --fused --no-metrics --envs 4096 \
    --timesteps 20000000 --game-mode hoops --seed 7 \
    --log docs_learning_check_hoops_r5.jsonl --checkpoints /tmp/ckpt_hoops
run heatseeker python examples/train_1v1.py --fused --no-metrics --envs 4096 \
    --timesteps 20000000 --game-mode heatseeker --seed 7 \
    --log docs_learning_check_heatseeker_r5.jsonl \
    --checkpoints /tmp/ckpt_heatseeker
run snowday python examples/train_1v1.py --fused --no-metrics --envs 4096 \
    --timesteps 20000000 --game-mode snowday --seed 7 \
    --log docs_learning_check_snowday_r5.jsonl --checkpoints /tmp/ckpt_snowday

echo "=== QUEUE PHASE 2 COMPLETE $(date -u +%H:%M:%S) ==="
