#!/bin/bash
# Round-4 sequential TPU measurement chain. One job at a time on the chip.
cd /root/repo
set -x
LOG=/tmp/r4_chain
mkdir -p $LOG

echo "=== 1. bench_train bf16 ==="
timeout 1800 python scripts/bench_train.py bf16 > $LOG/train_bf16.log 2>&1
echo "=== 2. bench_train fp32 ==="
timeout 1800 python scripts/bench_train.py fp32 > $LOG/train_fp32.log 2>&1
echo "=== 3. b64 cliff analysis ==="
timeout 2400 python scripts/analyze_b64_cliff.py > $LOG/b64_cliff.log 2>&1
echo "=== 4. train loss parity ==="
timeout 3600 python scripts/train_loss_parity.py 400 > $LOG/parity.log 2>&1
echo "=== 5. family-B generation record ==="
timeout 5400 python scripts/family_b_generation.py > $LOG/family_b.log 2>&1
echo "=== 6. retrain convergence checkpoint ==="
timeout 7200 python -m colddiff.cli.main train --degradation blur --dataset synthetic \
  --image_size 128 --time_steps 200 --blur_routine Exponential_reflect \
  --blur_size 15 --blur_std 0.01 --sampling_routine x0_step_down \
  --batch_size 16 --train_steps 15000 --save_and_sample_every 5000 \
  --exp_name convergence_blur128 --save_folder ./runs > $LOG/retrain.log 2>&1
echo "=== 7. refresh quality sweep ==="
timeout 5400 python scripts/eval_refresh_quality.py > $LOG/refresh.log 2>&1
echo "=== chain done ==="
