#!/usr/bin/env python
"""Pool-free beam search (wide_beam.beam_search) sweep at 1M x 768.

Same cached flagship index as exp_wide_1m (corpus/graph/gt in
/tmp/wide1m_cache). Sweeps (F, T, hist) against exact ground truth and
writes EXP_BEAM.json. Usage: python scripts/exp_beam_1m.py [quick]
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from exp_wide_1m import get_index, log, recall_of, timed  # noqa: E402


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    N = int(os.environ.get("EXP_N", 1_000_000))
    DIM, B, K10 = 768, 1000, 10
    index, x, q, gt = get_index(N, DIM, B)

    t0 = time.perf_counter()
    index.enable_wide(dims=128, seeds=int(os.environ.get("EXP_SEEDS",
                                                         16384)),
                      inline=True)
    index.search_batch_beam(q[:8], k=K10, frontier=16, steps=4)
    log(f"enable_wide + mirrors: {time.perf_counter() - t0:.0f}s")

    # (F, T, hist)
    if len(sys.argv) > 1 and sys.argv[1] == "quick":
        grid = [(224, 12, 2)]
    else:
        grid = [
            (224, 10, 2),
            (224, 14, 2),
            (256, 12, 2),
            (320, 12, 2),
            (224, 12, 1),
            (384, 14, 2),
        ]
    results = []
    for F, T, H in grid:
        def run(v, F=F, T=T, H=H):
            return index.search_batch_beam(
                np.asarray(v), k=K10, frontier=F, steps=T, hist=H)[0]

        _, ids = index.search_batch_beam(q, k=K10, frontier=F, steps=T,
                                         hist=H)
        qps = timed(run, q, B)
        rec = recall_of(ids, gt, K10)
        log(f"beam F={F} T={T} hist={H}: recall={rec:.4f} qps={qps:.0f}")
        results.append({"F": F, "T": T, "hist": H,
                        "recall": rec, "qps": qps})

    Path("EXP_BEAM.json").write_text(json.dumps(
        {"N": N, "dim": DIM, "results": results}, indent=2))
    log("wrote EXP_BEAM.json")


if __name__ == "__main__":
    main()
