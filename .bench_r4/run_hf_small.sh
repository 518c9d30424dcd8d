#!/bin/bash
cd /root/repo
out=/root/repo/.bench_r4/hf_small.jsonl
: > "$out"
for n in 2000 4000 8000; do
  echo "=== hf$n $(date -u +%H:%M:%S) ===" >> /root/repo/.bench_r4/hf_small.log
  KA9Q_BENCH_RETRY_S=1500 timeout 1800 python bench.py hf$n >> "$out" 2>> /root/repo/.bench_r4/hf_small.log
  echo "rc=$? for hf$n" >> /root/repo/.bench_r4/hf_small.log
done
echo DONE >> /root/repo/.bench_r4/hf_small.log
