#!/usr/bin/env python
"""Cross-process persistent compile-cache diagnosis on the axon backend.

Round-3 advisor item: search kernels missed the persistent cache across
processes on TPU while build kernels hit (CPU cross-process hits were
confirmed for the same kernels, so the keys are deterministic — the miss
is backend-specific). This script runs a representative search kernel in
TWO subprocesses against one cache dir with
``jax._src.compilation_cache`` debug logging and reports, per kernel
name, whether the second process wrote (miss) or loaded (hit).

Run on the healthy relay: python scripts/cache_probe_tpu.py
Writes CACHE_PROBE.json.
"""

import json
import re
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import logging, sys
sys.path.insert(0, {repo!r})
from vector_db_tpu.runtime import enable_compilation_cache
enable_compilation_cache({cache!r})
import jax
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
cclog = logging.getLogger("jax._src.compilation_cache")
cclog.setLevel(logging.DEBUG)
h = logging.StreamHandler(sys.stderr); h.setLevel(logging.DEBUG)
cclog.addHandler(h)
import numpy as np, jax.numpy as jnp
from vector_db_tpu.index.wide_beam import wide_search
from vector_db_tpu.ops.exact import approx_search_tiled
rng = np.random.default_rng(0)
cap, dim, dp = 4096, 128, 32
emb = jnp.asarray(rng.standard_normal((cap, dim), dtype=np.float32))
aug = jnp.zeros((cap, dp + 8), jnp.bfloat16)
nbr = jnp.asarray(rng.integers(0, cap, (cap, 16)), dtype=jnp.int32)
has = jnp.ones((cap,), bool)
seeds = jnp.arange(128, dtype=jnp.int32)
q = jnp.asarray(rng.standard_normal((8, dim), dtype=np.float32))
qa = jnp.zeros((8, dp + 8), jnp.float32)
out = wide_search(nbr, aug, emb, has, seeds, q, qa,
                  ef=128, F=16, T=4, k=8, rerank_k=32)
jax.block_until_ready(out)
out2 = approx_search_tiled(q, emb.astype(jnp.bfloat16), has, 8, tile=1024,
                           x_sq=jnp.sum(emb * emb, axis=-1))
jax.block_until_ready(out2)
print("CHILD_DONE", flush=True)
"""


def classify(stderr: str):
    events = {}
    for line in stderr.splitlines():
        m = re.search(r"(Writing|Persistent compilation cache hit for|"
                      r"Loaded) '?(jit_\w+)", line)
        if not m:
            m2 = re.search(r"Writing (jit_\w+) to persistent", line)
            if m2:
                events.setdefault(m2.group(1), []).append("write")
            continue
        verb = ("write" if m.group(1) == "Writing" else "hit")
        events.setdefault(m.group(2), []).append(verb)
    return events


def main():
    cache = tempfile.mkdtemp(prefix="axon_cache_probe_")
    runs = []
    for i in range(2):
        src = CHILD.format(repo=str(REPO), cache=cache)
        p = subprocess.run([sys.executable, "-c", src], capture_output=True,
                           text=True, timeout=1800)
        ev = classify(p.stderr)
        ok = "CHILD_DONE" in p.stdout
        runs.append({"ok": ok, "events": ev})
        print(f"run {i}: ok={ok} events="
              f"{ {k: v for k, v in ev.items() if 'search' in k or 'approx' in k} }",
              file=sys.stderr)
        if not ok:
            print(p.stderr[-2000:], file=sys.stderr)
    verdict = {}
    for name in set(runs[0]["events"]) | set(runs[1]["events"]):
        first = runs[0]["events"].get(name, [])
        second = runs[1]["events"].get(name, [])
        verdict[name] = {
            "first": first, "second": second,
            "cross_process_hit": "write" not in second and bool(first),
        }
    out = {"cache_dir": cache, "runs_ok": [r["ok"] for r in runs],
           "kernels": verdict}
    Path("CACHE_PROBE.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({k: v["cross_process_hit"]
                      for k, v in verdict.items()}, indent=1),
          file=sys.stderr)


if __name__ == "__main__":
    main()
