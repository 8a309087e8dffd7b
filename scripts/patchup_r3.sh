#!/bin/bash
# Round-3 patch-up queue: steps whose first run hit the broken Pallas
# kernels (fixed in a60a8c8/2c5c311) or the 1-core corpus-gen timeout.
# Run AFTER run_measurements.sh finishes: bash scripts/patchup_r3.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/meas

run() {
  name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout "${STEP_TIMEOUT:-3600}" "$@" > "/tmp/meas/$name.log" 2>&1
  rc=$?
  tail -n 5 "/tmp/meas/$name.log"
  echo "=== $name rc=$rc"
}

# kernels now compile on-chip: regenerate the micro + onchip artifacts
run micro_merge2     python scripts/micro_merge.py
run micro_adc_probe2 python scripts/micro_adc_probe.py
run pallas_onchip2   python scripts/pallas_onchip.py

# the scan section timed out on corpus gen (1-core host); cache exists now
run bench1m_scan2    env BENCH_SECTIONS=scan python scripts/bench_1m.py

echo "patchup done ($(date +%H:%M:%S)); logs in /tmp/meas/"
