#!/bin/bash
# Round-5 recorded-run queue (VERDICT r4 items 1, 2, 4, 6).
# Sequential: the box has ONE TPU chip; parallel jobs would fight over it.
# Usage: bash scripts/r5_queue.sh >/tmp/r5_logs/queue.log 2>&1
set -u
cd /root/repo
mkdir -p /tmp/r5_logs

run() {
  local name=$1; shift
  echo "=== START $name $(date -u +%H:%M:%S) ==="
  timeout 5400 "$@" >"/tmp/r5_logs/$name.out" 2>&1
  echo "=== DONE  $name rc=$? $(date -u +%H:%M:%S) ==="
}

# --- item 1: 50M 2v2 + 3v3 self-play re-runs, sampled (non-argmax) eval ---
rm -f docs_train_2v2_r5.jsonl docs_train_3v3_r5.jsonl
rm -rf checkpoints/train_2v2 checkpoints/train_3v3
run 2v2 python examples/train_teams.py --team-size 2 --envs 2048 \
    --timesteps 50000000 --log docs_train_2v2_r5.jsonl
run 3v3 python examples/train_teams.py --team-size 3 --envs 2048 \
    --timesteps 50000000 --log docs_train_3v3_r5.jsonl

# --- item 2: r2-shape learning checks (2048 envs, 49152 ts/iter, 400 it) ---
# plane run doubles as the shuffle_block_rows=128 arm of the A/B
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
# (8192 envs for the gather fast path; bf16 inference + async_report on)
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

echo "=== QUEUE COMPLETE $(date -u +%H:%M:%S) ==="
