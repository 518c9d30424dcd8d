#!/bin/bash
cd /root/repo
out=/root/repo/.bench_r4/hf_curve.jsonl
: > "$out"
for n in 16000 32000 64000 100000 150000 200000; do
  echo "=== hf$n $(date -u +%H:%M:%S) ===" >> /root/repo/.bench_r4/hf_curve.log
  KA9Q_BENCH_RETRY_S=1500 timeout 1800 python bench.py hf$n >> "$out" 2>> /root/repo/.bench_r4/hf_curve.log
  echo "rc=$? for hf$n" >> /root/repo/.bench_r4/hf_curve.log
done
echo DONE >> /root/repo/.bench_r4/hf_curve.log
