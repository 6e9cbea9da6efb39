#!/bin/bash
# Round-4 TPU chain, part 3: quality sweep + headline on the final dispatch.
cd /root/repo
set -x
LOG=/tmp/r4_chain3
mkdir -p $LOG

echo "=== 1. refresh quality sweep on the 15k ckpt ==="
timeout 7200 python scripts/eval_refresh_quality.py > $LOG/refresh.log 2>&1
echo "=== 2. headline bench ==="
timeout 5400 python bench.py > $LOG/bench.log 2>&1
echo "=== 3. train loss parity (final recipe) ==="
timeout 4500 python scripts/train_loss_parity.py 400 > $LOG/parity.log 2>&1
echo "=== 4. host-leak probe (axon transfer path) ==="
timeout 1800 python scripts/probe_host_leak.py 2000 > $LOG/leak.log 2>&1
echo "=== 5. host-leak probe with periodic sync ==="
timeout 1800 python scripts/probe_host_leak.py 2000 --sync-every 10 > $LOG/leak_sync.log 2>&1
echo "=== chain3 done ==="
