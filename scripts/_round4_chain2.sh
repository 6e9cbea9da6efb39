#!/bin/bash
# Round-4 TPU chain, part 2 (after _round4_chain.sh). One job at a time.
cd /root/repo
set -x
LOG=/tmp/r4_chain2
mkdir -p $LOG

echo "=== 1. fused block kernel race (bf16 B=16) ==="
timeout 2400 python scripts/bench_block.py > $LOG/block_bf16.log 2>&1
echo "=== 2. fused block kernel race (bf16 B=64) ==="
timeout 2400 python scripts/bench_block.py b64 > $LOG/block_b64.log 2>&1
echo "=== 3. train loss parity (bf16 leg rerun post roll-fix) ==="
timeout 3600 python scripts/train_loss_parity.py 400 > $LOG/parity.log 2>&1
echo "=== 4. bench_train bf16 with the fused block ==="
timeout 1800 python scripts/bench_train.py bf16 > $LOG/train_bf16.log 2>&1
echo "=== 5. resume convergence retrain 10000 -> 15000 ==="
timeout 7200 python -m colddiff.cli.main train --degradation blur --dataset synthetic \
  --image_size 128 --time_steps 200 --blur_routine Exponential_reflect \
  --blur_size 15 --blur_std 0.01 --sampling_routine x0_step_down \
  --batch_size 16 --train_steps 15000 --save_and_sample_every 5000 \
  --exp_name convergence_blur128 --save_folder ./runs > $LOG/retrain.log 2>&1
echo "=== 6. refresh quality sweep on the 15k ckpt ==="
timeout 7200 python scripts/eval_refresh_quality.py > $LOG/refresh.log 2>&1
echo "=== 7. headline bench ==="
timeout 5400 python bench.py > $LOG/bench.log 2>&1
echo "=== chain2 done ==="
