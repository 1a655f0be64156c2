#!/bin/bash
# Sequential protocol-scale emulator-parity sweep (2-CPU box: parallel jobs
# would just split OpenBLAS threads). Logs to docs/emulator_parity/run.log;
# partial JSONs land in docs/emulator_parity/, merged by --collect at the end.
cd "$(dirname "$0")/.." || exit 1
mkdir -p docs/emulator_parity
LOG=docs/emulator_parity/run.log
: > "$LOG"
for ds in sensor network taxi chicago; do
  for m in triple ttnn ring fctn sofia; do
    echo "=== $(date +%T) $ds $m ===" >> "$LOG"
    timeout 7200 python tools/emulator_parity.py --dataset "$ds" --method "$m" \
      >> "$LOG" 2>&1
    echo "rc=$? $(date +%T)" >> "$LOG"
  done
done
python tools/emulator_parity.py --collect >> "$LOG" 2>&1
echo "ALL DONE rc=$? $(date +%T)" >> "$LOG"
