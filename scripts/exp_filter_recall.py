#!/usr/bin/env python
"""Filtered wide-beam recall vs filter selectivity (hardware-independent).

For each selectivity, compares the two filtered engines at a fixed
traversal budget against masked exact ground truth:
  - pool: two-pool wide_search (matching-only result pool per step)
  - beam: pool-free beam_search (trajectory mask at deferred selection)
Writes EXP_FILTER.json. Reuses the exp_wide_1m corpus/graph cache; run
with EXP_N / VDB_FORCE_PLATFORM as needed (recall is platform-neutral).
"""

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from exp_wide_1m import get_index, log  # noqa: E402


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    N = int(os.environ.get("EXP_N", 1_000_000))
    DIM, B, K = 768, 1000, 10
    index, x, q, _ = get_index(N, DIM, B)
    index.enable_wide(dims=128,
                      seeds=int(os.environ.get("EXP_SEEDS", 16384)))

    rng = np.random.default_rng(21)
    nq = min(B, 200)  # masked brute force on host is O(nq * |filter|)
    qs = q[:nq]
    results = []
    for sel in (0.5, 0.1, 0.02):
        allowed_arr = rng.choice(N, size=max(64, int(N * sel)),
                                 replace=False)
        allowed = set(int(i) for i in allowed_arr)
        al = np.asarray(sorted(allowed))
        # masked ground truth in chunks (host)
        want = []
        xa = x[al]
        for i in range(nq):
            d = ((qs[i][None, :] - xa) ** 2).sum(-1)
            want.append(al[np.argsort(d)[:K]])
        want = np.stack(want)

        for engine in ("pool", "beam"):
            if engine == "pool":
                _, ids = index.search_batch_wide(
                    qs, k=K, ef=1280, frontier=224, steps=10,
                    rerank_k=256, seen_mask=False, filter_ids=allowed)
            else:
                _, ids = index.search_batch_beam(
                    qs, k=K, frontier=224, steps=12, rerank_k=512,
                    filter_ids=allowed)
            subset_ok = all(int(v) in allowed
                            for row in ids for v in row if v >= 0)
            rec = float(np.mean([
                len(set(int(v) for v in ids[i] if v >= 0)
                    & set(want[i].tolist())) / K
                for i in range(nq)]))
            log(f"sel={sel} engine={engine}: recall={rec:.4f} "
                f"subset_ok={subset_ok}")
            results.append({"selectivity": sel, "engine": engine,
                            "recall": rec, "subset_ok": subset_ok})

    Path("EXP_FILTER.json").write_text(json.dumps(
        {"N": N, "dim": DIM, "queries": nq, "results": results},
        indent=2))
    log("wrote EXP_FILTER.json")


if __name__ == "__main__":
    main()
