#!/bin/bash
# Round-4 scaling-trend extension (BASELINE.md protocol, run ALONE):
#   * 8->32 pair at 1B rows / 128M batch  (four-point 8->32 trend)
#   * 2->8  pair at 256M rows / 32M batch (three-point algorithmic trend)
#   * same-day pure-CPU calibration control
# Fresh JVM per level (frontier_job pins -XX:ActiveProcessorCount),
# frontier table + shuffle on /dev/shm, one untimed warm epoch,
# median of 3 timed epochs — identical to the round-2/3 protocol.
set -x
cd /root/repo
export PYTHONPATH=/root/repo
OUT=/tmp/scaling_r04
mkdir -p $OUT

pkill -9 java; sleep 3
# --- 8->32 @ 1B (materializes the table under the 32-core JVM, untimed) ---
python scripts/frontier_job.py 1000000000 32 128000000 /dev/shm/frontier_bench_1000000000 3 \
  > $OUT/1b_32.json 2> $OUT/1b_32.log
pkill -9 java; sleep 3
python scripts/frontier_job.py 1000000000 8 128000000 /dev/shm/frontier_bench_1000000000 3 \
  > $OUT/1b_8.json 2> $OUT/1b_8.log
pkill -9 java; sleep 3
rm -rf /dev/shm/frontier_bench_1000000000

# --- 2->8 @ 256M ---
python scripts/frontier_job.py 256000000 8 32000000 /dev/shm/frontier_bench_256000000 3 \
  > $OUT/256m_8.json 2> $OUT/256m_8.log
pkill -9 java; sleep 3
python scripts/frontier_job.py 256000000 2 32000000 /dev/shm/frontier_bench_256000000 3 \
  > $OUT/256m_2.json 2> $OUT/256m_2.log
pkill -9 java; sleep 3
rm -rf /dev/shm/frontier_bench_256000000

# --- same-day pure-CPU ceiling controls (both pairs) ---
python scripts/cpu_calibration.py > $OUT/cpu_cal.json 2> $OUT/cpu_cal.log
pkill -9 java; sleep 3
python scripts/cpu_calibration.py 32000000 2 8 > $OUT/cpu_cal_2_8.json 2> $OUT/cpu_cal_2_8.log
pkill -9 java; sleep 3

# --- same-day re-anchor of the round-3 2->8 config (128M rows / 16M batch):
# separates machine-day variance from config effects when comparing rounds ---
python scripts/frontier_job.py 128000000 8 16000000 /dev/shm/frontier_bench_128000000 3 \
  > $OUT/128m_8.json 2> $OUT/128m_8.log
pkill -9 java; sleep 3
python scripts/frontier_job.py 128000000 2 16000000 /dev/shm/frontier_bench_128000000 3 \
  > $OUT/128m_2.json 2> $OUT/128m_2.log
pkill -9 java; sleep 3
rm -rf /dev/shm/frontier_bench_128000000

echo DONE
tail -n 1 $OUT/*.json
