"""Compile-time bound for the refined scheme at config 5's horizon
(VERDICT r3 weak #6): `run_refined` unrolls an O(n) recursion — 128 step
bodies + 127 OP calls in one program at n=128 — and the refined scheme
has never been compiled there (config 5 trains staggered; the known
failure mode is compile time through the slow TPU relay).

This measures jit lower+compile wall-clock and compiled memory of the
FULL-SIZE refined train step (64², n=128, batch 8, production remat) on
the CPU backend — the compiler cost is the object under test and the CPU
backend exercises the same XLA frontend without risking a wedged remote
relay mid-queue. Prints one JSON line.

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python
     scripts/refined128_compile.py [--n 128] [--size 64]
(drop PALLAS_AXON_POOL_IPS from the env.)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import __graft_entry__  # noqa: F401
from __graft_entry__ import _make_app, _make_batch

import jax

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--impl", default="auto",
                    choices=("auto", "scan", "unrolled"),
                    help="refined builder: 'unrolled' is the O(n) recursion "
                    "(observed rc=124 at n=128), 'scan' the O(log n) rewrite")
    args = ap.parse_args()
    t0 = time.time()
    app = _make_app(args.size, args.n, args.batch,
                    sequence_class="refined")
    if args.impl != "auto":
        app.refined_impl = args.impl
    batch = _make_batch(args.size, args.n, args.batch)
    build_s = time.time() - t0

    t0 = time.time()
    lowered = jax.jit(app._train_step_impl).lower(
        app.params, app.opt_state, batch)
    lower_s = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    mem = compiled.memory_analysis()
    print(json.dumps({
        "scheme": "refined", "impl": app.refined_impl,
        "n": args.n, "size": args.size,
        "batch": args.batch,
        "platform": jax.devices()[0].platform,
        "build_trace_s": round(build_s, 1),
        "lower_s": round(lower_s, 1),
        "compile_s": round(compile_s, 1),
        "temp_gb": round(mem.temp_size_in_bytes / 2**30, 2),
        "argument_mb": round(mem.argument_size_in_bytes / 2**20, 1),
    }), flush=True)
