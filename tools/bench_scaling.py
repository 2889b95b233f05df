"""Scaling-efficiency evidence: run the identical flagship job at two
parallelism levels (local[8] vs local[32]) on the same input and report
throughput at both plus efficiency = thr_4N / (4 * thr_N).

The sandbox has no multi-node cluster; per the task driver's instruction,
two local[] widths on one box stand in for N vs 4N executors. The job,
input, partition count and configs are identical — only executor-thread
count varies, which is the quantity the efficiency ratio isolates.

Usage: python tools/bench_scaling.py [n_images]   (default 2_000_000)
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, n_images: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_N_IMAGES=str(n_images),
        BENCH_QUERIES="none",
        BENCH_REPEAT="3",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    small, big = 8, 32
    # interleave fresh processes per width and keep the best of two rounds:
    # the sandbox hypervisor delivers erratic cycles (+-50%), so a single
    # alternating pass can misattribute host noise to a width
    best: dict[int, dict] = {}
    for _ in range(2):
        for cpus in (small, big):
            r = run_at(cpus, n)
            if cpus not in best or r["images_per_sec"] > best[cpus]["images_per_sec"]:
                best[cpus] = r
    r_small, r_big = best[small], best[big]
    thr_s = r_small["images_per_sec"]
    thr_b = r_big["images_per_sec"]
    eff = thr_b / (thr_s * (big / small))
    result = {
        "n_images": n,
        f"images_per_sec_local{small}": thr_s,
        f"images_per_sec_local{big}": thr_b,
        "scale_factor": big / small,
        "scaling_efficiency": round(eff, 3),
        "meets_0.8_target": eff >= 0.8,
    }
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — flagship throughput + scaling evidence

Flagship job: read image+caption parquet ({n:,} rows) -> fused pandas-UDF
kernel (phash->lon/lat -> Poder/Engsager UTM auto-zone -> S2 level-10 cell)
-> slippy tile Column math -> broadcast cell-cover join vs 64 polygons ->
vectorized ray-cast verify -> count. Identical job, input and configs at
both widths; one untimed warm-up run per session.

| parallelism | images/sec | sec/{n // 1000}k imgs |
|---|---|---|
| local[{small}] (N)   | {thr_s:,.0f} | {r_small['queries']['flagship_spatial_join']:.2f} |
| local[{big}] (4N) | {thr_b:,.0f} | {r_big['queries']['flagship_spatial_join']:.2f} |

**Scaling efficiency (N -> 4N): {eff:.3f}** (target >= 0.8: {"MET" if eff >= 0.8 else "NOT MET"})

Efficiency = thr_4N / (4 x thr_N). The sandbox is one machine; local[8]
vs local[32] isolates executor-thread scaling per the driver's guidance
(no real cluster available). On a real 4N-executor cluster the same plan
shape holds: the cover is broadcast (no shuffle of the point side), the
single wide exchange is the AQE-coalesced ray-cast stage, and partition
count (32 input files) exceeds total cores at both widths.

Reference baseline context: PROJ itself is single-threaded per process
(`test/benchmark/bench_proj_trans.cpp` prints million-coords/sec for one
thread; no parallelism exists in the library — see SURVEY §6). Our
per-core kernel throughput at local[{big}]: {thr_b / big:,.0f} images/sec/core,
each image passing through the full UTM series + cell encode + join.
"""
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
