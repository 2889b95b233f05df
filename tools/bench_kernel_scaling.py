"""Raw kernel-chain scaling probe: the flagship per-point math (datum
Helmert + UTM + LCC + S2 encode) in K independent python processes with
no JVM, no Arrow, no shared session — the closest one-box analogue of
independent executors, each owning its own allocator and cache footprint.

Prints one JSON line with aggregate pts/s at 2/8/32 procs and the 8->32
efficiency. Run on an idle box; cycles here are hypervisor-noisy.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def work(n: int) -> float:
    import numpy as np

    from proj_spark import cells
    from proj_spark.functions import GDA_DATUM_SPEC, KERNEL_CHUNK, LCC_CONUS_SPEC
    from proj_spark.plans.pipeline import compile_pipeline
    from proj_spark.sources.synth import lonlat_from_phash, splitmix64

    datum = compile_pipeline(GDA_DATUM_SPEC)
    utm = compile_pipeline("+proj=utm +ellps=WGS84")
    lcc = compile_pipeline(LCC_CONUS_SPEC)
    ph = splitmix64(np.arange(n, dtype=np.uint64)).view(np.int64)

    def chain(p):
        lon, lat = lonlat_from_phash(p)
        lon2, lat2, _, _ = datum.fwd_deg(lon, lat, np.zeros_like(lon))
        utm.fwd_deg(lon2, lat2)
        lcc.fwd_deg(lon2, lat2)
        cells.s2_cell_id(lon2, lat2, 10)

    chain(ph[:1000])  # warm
    t0 = time.time()
    for i in range(0, n, KERNEL_CHUNK):  # cache-blocked like the UDF
        chain(ph[i : i + KERNEL_CHUNK])
    return n / (time.time() - t0)


def main() -> None:
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    n_per = 2_000_000
    agg = {}
    for procs in (2, 8, 32):
        with mp.Pool(procs) as pool:
            pool.map(work, [100_000] * procs)  # warm pools
            t0 = time.time()
            pool.map(work, [n_per] * procs)
            agg[procs] = procs * n_per / (time.time() - t0)
    print(json.dumps({
        "pts_per_sec": {str(k): round(v) for k, v in agg.items()},
        "efficiency_8_to_32": round(agg[32] / (4 * agg[8]), 3),
        "efficiency_2_to_8": round(agg[8] / (4 * agg[2]), 3),
    }))


if __name__ == "__main__":
    main()
