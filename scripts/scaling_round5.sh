#!/bin/bash
# Round-5 scaling re-anchor (BASELINE.md protocol, run ALONE):
#   * 2->8  pair at 128M rows / 16M batch — the round-3/4 anchor config,
#     re-measured same-day AFTER the serial-floor shave (r5: one counter
#     action, single broadcast subtree, AQE off for the pre-sized epoch)
#   * 8->32 pair at 64M rows / 8M batch — the small-epoch config where the
#     fixed floor dominated (r3/r4 trend point 0.444): shows how much of
#     the floor the shave recovered
#   * same-day pure-CPU ceiling controls for both pairs
# Fresh JVM per level (frontier_job pins -XX:ActiveProcessorCount),
# frontier table + shuffle on /dev/shm, one untimed warm epoch,
# median of 3 timed epochs — identical to the round-2/3/4 protocol.
set -x
cd /root/repo
export PYTHONPATH=/root/repo
OUT=/tmp/scaling_r05
mkdir -p $OUT

pkill -9 java; sleep 3
# --- 2->8 @ 128M / 16M batch (same config as the r3 anchor + r4 re-anchor) ---
python scripts/frontier_job.py 128000000 8 16000000 /dev/shm/frontier_bench_128000000 3 \
  > $OUT/128m_8.json 2> $OUT/128m_8.log
pkill -9 java; sleep 3
python scripts/frontier_job.py 128000000 2 16000000 /dev/shm/frontier_bench_128000000 3 \
  > $OUT/128m_2.json 2> $OUT/128m_2.log
pkill -9 java; sleep 3
rm -rf /dev/shm/frontier_bench_128000000

# --- 8->32 @ 64M / 8M batch (the small-epoch floor-dominated trend point) ---
python scripts/frontier_job.py 64000000 32 8000000 /dev/shm/frontier_bench_64000000 3 \
  > $OUT/64m_32.json 2> $OUT/64m_32.log
pkill -9 java; sleep 3
python scripts/frontier_job.py 64000000 8 8000000 /dev/shm/frontier_bench_64000000 3 \
  > $OUT/64m_8.json 2> $OUT/64m_8.log
pkill -9 java; sleep 3
rm -rf /dev/shm/frontier_bench_64000000

# --- same-day pure-CPU ceiling controls (both pairs) ---
python scripts/cpu_calibration.py > $OUT/cpu_cal_8_32.json 2> $OUT/cpu_cal_8_32.log
pkill -9 java; sleep 3
python scripts/cpu_calibration.py 32000000 2 8 > $OUT/cpu_cal_2_8.json 2> $OUT/cpu_cal_2_8.log
pkill -9 java; sleep 3

echo DONE
tail -n 1 $OUT/*.json
