#!/bin/bash
# Fire the pending round-3 TPU measurement sequence as soon as the chip
# recovers (CLAUDE.md "PENDING on TPU recovery"). Serial by construction:
# waits for /tmp/tpu_alive (touched by /tmp/tpu_watch.sh), then for the CPU
# pytest suite (if running) to exit — two heavy JAX processes on this
# 1-core host corrupt each other (CLAUDE.md platform gotchas).
#
# Usage: nohup scripts/tpu_recovery_run.sh > /tmp/tpu_recovery/driver.log 2>&1 &
set -u
OUT=/tmp/tpu_recovery
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

echo "$(date) waiting for /tmp/tpu_alive"
while [ ! -f /tmp/tpu_alive ]; do sleep 60; done
echo "$(date) TPU alive: $(head -1 /tmp/tpu_alive)"

if [ -f /tmp/suite_r3.pid ]; then
  while kill -0 "$(cat /tmp/suite_r3.pid)" 2>/dev/null; do
    echo "$(date) waiting for CPU suite to finish"; sleep 60
  done
fi

run() {
  name=$1; shift
  echo "$(date) === $name"
  timeout 3000 python -u "$@" > "$OUT/$name.log" 2>&1
  echo "$(date) === $name done rc=$?"
}

cd /root/repo
run pack_ab        scripts/tpu_pack_ab.py 512
run stage_times    scripts/tpu_stage_times.py
run compaction     scripts/tpu_compaction_micro.py
run 2d_bench       scripts/tpu_2d_bench.py
run bench          bench.py
echo "$(date) ALL DONE"
touch "$OUT/ALL_DONE"
