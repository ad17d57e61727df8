"""Interleaved calibrated A/B of two engine binaries (VERDICT r03 #2).

Runs bench.py from two repo checkouts in fresh subprocesses under an
ABBA pattern (A=old, B=new), with a single-core zstd:22 calibration
probe before and after every run — the same probe bench.py itself
records — so each run's wall times can be normalized against the
sandbox VM's per-core throttle window at the time it ran. Prints
per-query raw and cal-normalized ratios (new/old; < 1 means the new
binary is faster after machine-state correction).

Usage: python tools/ab_bench.py OLD_REPO NEW_REPO [pattern]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

PROBE = r"""
import time, numpy as np, pyarrow as pa
rng = np.random.default_rng(0)
buf = rng.integers(0, 1000, 2_000_000).astype(np.int32).tobytes()
c = pa.Codec("zstd", compression_level=22)
t0 = time.perf_counter(); c.compress(buf); dt = time.perf_counter() - t0
print(len(buf) / dt / 1e9)
"""


def probe() -> float:
    out = subprocess.run(
        [sys.executable, "-c", PROBE], capture_output=True, text=True,
        check=True,
    ).stdout
    return float(out.strip())


def run_bench(repo: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    env.setdefault("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("RAY_GRAFT_CPUS", "32")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=repo,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


PREWARM = r"""
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from fastparquet_ray.pipelines.flagship import ensure_encoded
import os
ensure_encoded(os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
ray.shutdown()
"""


def prewarm(repo: str) -> None:
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    subprocess.run(
        [sys.executable, "-c", PREWARM], env=env, cwd=repo,
        capture_output=True, text=True, check=True,
    )


def main() -> None:
    old_repo, new_repo = sys.argv[1], sys.argv[2]
    pattern = sys.argv[3] if len(sys.argv) > 3 else "ABBA"
    # both binaries keep their own /tmp encode caches (different codec
    # generations can't decode each other's shards) — warm them before
    # the timed pattern so no run pays a first-build inside a query
    for repo in (old_repo, new_repo):
        prewarm(repo)
        print(f"# prewarmed {repo}", file=sys.stderr)
    runs = []
    for ch in pattern:
        repo = old_repo if ch == "A" else new_repo
        c0 = probe()
        t0 = time.time()
        res = run_bench(repo)
        wall = time.time() - t0
        c1 = probe()
        cal = (c0 + c1) / 2
        runs.append(
            {"which": "old" if ch == "A" else "new", "cal": cal,
             "wall": round(wall, 1), "queries": res["queries"],
             "encode_gbps": res.get("encode_gbps"),
             "ratio": res.get("compression_ratio")}
        )
        print(
            f"# {runs[-1]['which']}: cal={cal:.5f} GB/s wall={wall:.0f}s",
            file=sys.stderr,
        )

    # per-query medians of cal-normalized seconds (sec * cal = work in
    # probe-equivalent GB — machine-state-corrected cost)
    def norm(run, q):
        v = run["queries"].get(q)
        return None if v is None else v * run["cal"]

    shared = sorted(
        set.intersection(*[set(r["queries"]) for r in runs])
    )
    table = {}
    for q in shared:
        old_raw = [r["queries"][q] for r in runs if r["which"] == "old"]
        new_raw = [r["queries"][q] for r in runs if r["which"] == "new"]
        old_n = [norm(r, q) for r in runs if r["which"] == "old"]
        new_n = [norm(r, q) for r in runs if r["which"] == "new"]
        med = lambda xs: sorted(xs)[len(xs) // 2] if len(xs) % 2 else sum(
            sorted(xs)[len(xs) // 2 - 1 : len(xs) // 2 + 1]
        ) / 2
        table[q] = {
            "old_sec": round(med(old_raw), 3),
            "new_sec": round(med(new_raw), 3),
            "raw_ratio": round(med(new_raw) / med(old_raw), 3),
            "cal_ratio": round(med(new_n) / med(old_n), 3),
        }
    print(json.dumps({"runs": runs, "per_query": table}, indent=1))


if __name__ == "__main__":
    main()
