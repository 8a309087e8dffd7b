#!/bin/bash
# Round-3 TPU measurement queue. Run from the repo root when the relay is
# healthy: bash scripts/run_measurements.sh [phase]
# Phases: micro kernels first (cheap, highest information), then 1M
# sections, then sweeps. Each step logs to /tmp/meas/<name>.log and
# continues on failure; artifacts land in the repo as usual.
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

phase="${1:-all}"

if [ "$phase" = all ] || [ "$phase" = micro ]; then
  run canary python - <<'EOF'
import jax, time, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((2048, 2048), jnp.bfloat16)
t = time.time(); (x @ x).block_until_ready(); print("warm", time.time() - t)
for _ in range(3):
    t = time.time(); (x @ x).block_until_ready(); print("rep", time.time() - t)
EOF
  run micro_merge      python scripts/micro_merge.py
  run micro_adc_probe  python scripts/micro_adc_probe.py
  run pallas_onchip    python scripts/pallas_onchip.py
  run cache_probe      python scripts/cache_probe_tpu.py
fi

if [ "$phase" = all ] || [ "$phase" = sections ]; then
  # cached corpus/graph (first run populates /tmp/wide1m_cache)
  run bench1m_scan     env BENCH_SECTIONS=scan   python scripts/bench_1m.py
  run bench1m_filter   env BENCH_SECTIONS=filter python scripts/bench_1m.py
  run bench1m_wide     env BENCH_SECTIONS=wide   python scripts/bench_1m.py
  run bench1m_beam     env BENCH_SECTIONS=beam   python scripts/bench_1m.py
fi

if [ "$phase" = all ] || [ "$phase" = sweeps ]; then
  run exp_blocksel     python scripts/exp_blocksel.py
  run exp_wide_mk      env EXP_MERGE_KERNEL=1 python scripts/exp_wide_1m.py
  run exp_sched        python scripts/exp_wide_1m.py sched
  run exp_beam         python scripts/exp_beam_1m.py
  run bench_sift       python scripts/bench_sift.py
  run bench_tiered     python scripts/bench_tiered.py
fi

if [ "$phase" = all ] || [ "$phase" = long ]; then
  # alpha graph build + two OPQ trainings can exceed the 1h default
  STEP_TIMEOUT=7200
  run exp_alpha        env EXP_ALPHA=1.2 python scripts/exp_wide_1m.py
  run exp_wide_final   env EXP_ALPHA=1.2 python scripts/exp_wide_final.py
  run exp_opq          python scripts/exp_opq_1m.py
  STEP_TIMEOUT=3600
  run exp_blocksel2    python scripts/exp_blocksel.py
  run bench_sift2      python scripts/bench_sift.py
  run bench_headline   python bench.py
  run bench_api        python scripts/bench_api.py
  run pallas_onchip2   python scripts/pallas_onchip.py
fi

echo "queue done ($(date +%H:%M:%S)); logs in /tmp/meas/"
