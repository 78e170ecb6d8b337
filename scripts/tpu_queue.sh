#!/bin/bash
# Serial TPU measurement queue with wedge-aware pacing.
#
# Usage: setsid nohup scripts/tpu_queue.sh OUTDIR name1=script1 [args...] --
#        name2=script2 -- ... < /dev/null > /dev/null 2>&1 &
# Each item runs as: timeout ${ITEM_TIMEOUT:-3600} python -u scripts/_safe_run.py <script> <args>
#
# Why this shape (CLAUDE.md platform gotchas, measured repeatedly):
# - ONE item at a time: two heavy JAX clients on this 1-core host corrupt
#   each other (SIGABRT in XLA readbacks) and fight for the relay.
# - Probe the tunnel in a SUBPROCESS with a hard timeout before every item:
#   a wedged remote worker hangs jax.devices() in-process forever; probing
#   turns that into a bounded wait. A process killed mid-device-op wedges
#   the worker for ~20-40 min, so burning items into a wedge cascades.
# - setsid/nohup detachment: a dying CLI session must not SIGKILL a child
#   that holds an initialized backend (that is what causes the wedges).
set -u
OUT=$1; shift
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
cd /root/repo

probe() {
  # retry the liveness probe for up to ~50 min before giving up
  for _ in $(seq 1 10); do
    if timeout 120 python -c \
      "import jax, numpy as np; x = jax.device_put(np.int32(1)); assert int(np.asarray(x)) == 1" \
      > /dev/null 2>&1; then
      return 0
    fi
    echo "$(date) tunnel dead; waiting" >> "$OUT/queue.log"
    sleep 300
  done
  return 1
}

while [ $# -gt 0 ]; do
  item=$1; shift
  args=()
  while [ $# -gt 0 ] && [ "$1" != "--" ]; do args+=("$1"); shift; done
  [ $# -gt 0 ] && shift  # drop the --
  name=${item%%=*}
  script=${item#*=}
  # serialize against a CPU suite (both fight for the single core)
  while [ -f /tmp/cpu_busy ]; do sleep 60; done
  if ! probe; then
    echo "$(date) === $name SKIPPED (tunnel dead ~50 min)" >> "$OUT/queue.log"
    continue
  fi
  echo "$(date) === $name" >> "$OUT/queue.log"
  timeout "${ITEM_TIMEOUT:-3600}" python -u scripts/_safe_run.py \
    "$script" ${args[@]+"${args[@]}"} > "$OUT/$name.log" 2>&1
  echo "$(date) === $name done rc=$?" >> "$OUT/queue.log"
done
echo "$(date) QUEUE DONE" >> "$OUT/queue.log"
touch "$OUT/QUEUE_DONE"
