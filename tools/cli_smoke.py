"""Scripted end-to-end CLI smoke (VERDICT r04 #6): drive the whole
verb surface on a fresh dir and assert the manifest / resume / layout
invariants that unit tests cover only piecewise:

    gen -> encode --cluster-by --bloom -> verify --exact -> stats
        -> optimize -> verify --exact (optimized layout)
        -> decode --resumable (idempotent rerun + single-file repair)
        -> decode --format jsonl

Each verb runs as its own `python -m fastparquet_ray` process (its own
Ray session), exactly as a user would invoke it.

Usage: python tools/cli_smoke.py [workdir]   (default: mktemp)
Exits non-zero on the first failed invariant; prints one PASS line per
stage and a final JSON summary.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args: list[str]) -> dict:
    """Run one CLI verb; return its final JSON line."""
    t0 = time.time()
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-m", "fastparquet_ray", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
    )
    if proc.returncode != 0:
        print(proc.stdout[-2000:])
        print(proc.stderr[-4000:])
        raise SystemExit(f"FAIL: {' '.join(args)} rc={proc.returncode}")
    line = [
        ln
        for ln in proc.stdout.strip().splitlines()
        if ln.startswith("{")
    ]
    out = json.loads(line[-1]) if line else {}
    print(f"PASS  {args[0]:<8s} {time.time() - t0:5.1f}s  {out}")
    return out


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="fpray_smoke_"
    )
    os.makedirs(work, exist_ok=True)
    src = os.path.join(work, "src")
    enc = os.path.join(work, "enc")
    opt = os.path.join(work, "opt")
    pqd = os.path.join(work, "pq")
    jld = os.path.join(work, "jl")

    g = run(["gen", src, "--rows", "4000", "--fragments", "4"])
    assert g["rows"] == 4000, g

    e = run(
        [
            "encode", src, enc,
            "--cluster-by", "doc_id,n_tok",
            "--bloom", "tokens",
        ]
    )
    assert e["rows"] == 4000 and e["encoded"] > 0, e
    assert e["ratio"] < 0.2, e  # lightweight codecs must actually bite

    # encode rerun = pure resume: nothing re-encodes
    e2 = run(["encode", src, enc, "--cluster-by", "doc_id,n_tok",
              "--bloom", "tokens"])
    assert e2["encoded"] == 0 and e2["skipped"] == e["encoded"], e2

    v = run(["verify", src, enc, "--exact"])
    assert v["ok"] and v["mismatched_groups"] == 0, v

    run(["stats", enc])  # table output; rc-0 is the check

    o = run(["optimize", enc, opt, "--cluster-by", "source,n_tok"])
    v2 = run(["verify", src, opt, "--exact"])
    assert v2["ok"], (o, v2)

    d1 = run(["decode", opt, pqd, "--resumable"])
    n_files = len(
        [
            p
            for p in glob.glob(pqd + "/**/*.parquet", recursive=True)
            if not os.path.basename(p).startswith("_")
        ]
    )
    assert d1["exported"] == n_files and d1["rows"] == 4000, d1
    assert os.path.exists(os.path.join(pqd, "_metadata")), (
        "consolidated _metadata sidecar missing"
    )
    # idempotent rerun: everything skips
    d2 = run(["decode", opt, pqd, "--resumable"])
    assert d2["exported"] == 0 and d2["skipped"] == n_files, d2
    # single-file repair: delete one output, exactly one re-exports
    victim = sorted(
        p
        for p in glob.glob(pqd + "/**/*.parquet", recursive=True)
        if not os.path.basename(p).startswith("_")
    )[0]
    os.remove(victim)
    d3 = run(["decode", opt, pqd, "--resumable"])
    assert d3["exported"] == 1 and d3["skipped"] == n_files - 1, d3
    assert os.path.exists(victim), "repaired file not republished"

    run(["decode", opt, jld, "--format", "jsonl"])
    n_rows = 0
    for p in glob.glob(jld + "/*.json*"):
        with open(p) as f:
            n_rows += sum(1 for _ in f)
    assert n_rows == 4000, n_rows

    print(json.dumps({"smoke": "ok", "workdir": work, "stages": 11}))


if __name__ == "__main__":
    main()
