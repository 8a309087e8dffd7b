#!/bin/bash
# Round-4 measurement queue (run AFTER exp_p2_chunk finishes).
# Sequential — the host is single-core and the TPU relay serializes
# anyway. Each step logs to /tmp/r4q_<name>.log and is bounded.
set -u
cd /root/repo

step() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ===" >> /tmp/r4q.log
  timeout 3600 "$@" > /tmp/r4q_$name.log 2>&1
  echo "=== $name exit=$? $(date +%H:%M:%S) ===" >> /tmp/r4q.log
}

step latency   python scripts/bench_latency.py
step filter    env BENCH_SECTIONS=filter python scripts/bench_1m.py
step pqfetch   python scripts/exp_pq_fetch.py
step ivfceil   python scripts/exp_ivf_ceiling.py
# re-measure service ingest after the batched-storage-write fix
# (round-3 artifact was pre-fix: 213 vec/s)
step tiered    python scripts/bench_tiered.py
# HTTP-in-the-loop service numbers (VERDICT missing #1); CPU engine,
# host-bound — runs last so it can't starve the TPU timing steps
step api       python scripts/bench_api.py
echo "=== queue done $(date +%H:%M:%S) ===" >> /tmp/r4q.log
