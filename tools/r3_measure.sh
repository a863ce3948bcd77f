#!/bin/bash
# Round-3 measurement sequence (run when the axon relay is back).
# Each config in its own process; logs append so partial runs survive.
cd /root/repo
echo "=== r3 measure start $(date)" >> /tmp/exp_r3b.log
echo "=== compile sanity $(date)" >> /tmp/exp_r3b.log
timeout 3600 python tools/compile_check_r3.py >> /tmp/exp_r3b.log 2>&1
for c in R Q E H J I L M P X; do
  echo "--- ONLY=$c $(date)" >> /tmp/exp_r3b.log
  ONLY=$c timeout 2400 python experiments/exp_round3b.py >> /tmp/exp_r3b.log 2>&1
done
echo "=== canonical bench $(date)" >> /tmp/exp_r3b.log
timeout 2400 python bench.py > /tmp/bench_r3.json 2>/tmp/bench_r3.err
echo "=== done $(date)" >> /tmp/exp_r3b.log
