#!/usr/bin/env python
"""IVF coarse-quantizer probe-ceiling sweep at 1M x 768 (VERDICT r3 #9).

Round-3 finding (BENCH_1M ivf_rp): with 4096 cells / spill 2 the probe
ceiling — the best ANY in-cell scoring could achieve — was only
0.635/0.789/0.905 at 64/128/256 probes on the clustered 768-d corpus,
so probe-mode IVF was pareto-dominated by the block-select scan. The
levers are finer cells (smaller Voronoi regions at the same scanned
fraction) and wider SOAR-style spill (each vector assigned to its s
nearest cells, so a boundary neighbor has s chances to share a probed
cell). This sweeps (k_cells, spill) and reports the ceiling at
n_probe in {16..256}, plus the scanned-fraction each point costs.
Target: >=0.98 at n_probe <= 64. Writes EXP_IVF_CEILING.json.
"""

import gc
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CACHE = Path("/tmp/wide1m_cache")
N, DIM, B, K = 1_000_000, 768, 1000, 10


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from vector_db_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    from vector_db_tpu.index.ivf import IvfIndex

    data = np.load(CACHE / "data.npy", mmap_mode="r")
    x = np.asarray(data[:N])
    q = np.asarray(data[N:])
    gt = np.load(CACHE / "gt.npy")

    out = {"N": N, "dim": DIM, "B": B, "k": K, "rows": []}

    for n_cells, spill in ((4096, 4), (8192, 2), (8192, 4),
                           (16384, 2), (16384, 4)):
        t0 = time.perf_counter()
        ivf = IvfIndex(k=n_cells)
        ivf.build_arrays(range(N), x, seed=0, iters=20, spill=spill,
                         list_cap_alpha=2.0)
        build_s = time.perf_counter() - t0
        sizes = np.asarray([len(l) for l in ivf.inverted_lists])
        stored = int(sizes.sum())

        cell_of = [[] for _ in range(N)]
        for c, lst in enumerate(ivf.inverted_lists):
            for nid in lst:
                cell_of[nid].append(c)
        cents = ivf.centroids
        cdh = ((cents * cents).sum(-1)[None, :] - 2.0 * (q @ cents.T))
        order = np.argsort(cdh, axis=1)

        ceilings = {}
        frac = {}
        for n_probe in (16, 32, 64, 128, 256):
            probed = [set(order[i, :n_probe].tolist()) for i in range(B)]
            ceilings[n_probe] = round(float(np.mean(
                [[bool(set(cell_of[g]) & probed[i]) for g in gt[i]]
                 for i in range(B)])), 4)
            # average fraction of stored rows a probe touches
            frac[n_probe] = round(float(np.mean(
                [sizes[order[i, :n_probe]].sum() for i in range(B)]
            ) / N), 4)
        row = {"k_cells": n_cells, "spill": spill, "build_s": round(
            build_s, 1), "stored_rows": stored,
            "ceiling": ceilings, "scan_frac": frac}
        log(f"{row}")
        out["rows"].append(row)
        Path("EXP_IVF_CEILING.json").write_text(json.dumps(out, indent=1))
        del ivf
        gc.collect()
    log("done")


if __name__ == "__main__":
    main()
