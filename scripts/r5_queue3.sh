#!/bin/bash
# Round-5 queue, phase 3: the minibatched shuffle A/B (the first A/B at
# mini_batch_size=0 never shuffled — identical curves, vacuous), plus
# 2v2/3v3 refreshed on the FINAL round-5 stack (fused sampling kernel +
# batched-pool eval) so the recorded team runs cover what ships.
set -u
cd /root/repo
mkdir -p /tmp/r5_logs

run() {
  local name=$1; shift
  echo "=== START $name $(date -u +%H:%M:%S) ==="
  timeout 5400 "$@" >"/tmp/r5_logs/$name.out" 2>&1
  echo "=== DONE  $name rc=$? $(date -u +%H:%M:%S) ==="
}

# --- item 2: shuffle_block_rows A/B with 4 minibatches (ref economics) ---
run ab128mb4 python scripts/learning_check.py --envs 2048 --iterations 400 \
    --mini-batches 4 --log docs_ab_shuffle_block128_mb4_r5.jsonl
run ab1mb4 python scripts/learning_check.py --envs 2048 --iterations 400 \
    --mini-batches 4 --shuffle-block-rows 1 \
    --log docs_ab_shuffle_block1_mb4_r5.jsonl

# --- item 1: team runs on the final stack (fast eval + sampling kernel) ---
rm -f docs_train_2v2_r5.jsonl docs_train_3v3_r5.jsonl
rm -rf checkpoints/train_2v2 checkpoints/train_3v3
run 2v2b python examples/train_teams.py --team-size 2 --envs 2048 \
    --timesteps 50000000 --log docs_train_2v2_r5.jsonl
run 3v3b python examples/train_teams.py --team-size 3 --envs 2048 \
    --timesteps 50000000 --log docs_train_3v3_r5.jsonl

# --- item 6: hoops re-run after the RandomState extents fix (the first
# run spawned ~25% of entities inside the walls and never learned) ---
rm -f docs_learning_check_hoops_r5.jsonl
run hoops2 python examples/train_1v1.py --fused --no-metrics --envs 4096 \
    --timesteps 20000000 --game-mode hoops --seed 7 \
    --log docs_learning_check_hoops_r5.jsonl --checkpoints /tmp/ckpt_hoops2

echo "=== QUEUE PHASE 3 COMPLETE $(date -u +%H:%M:%S) ==="
