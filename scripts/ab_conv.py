"""A/B models/nets.py :: Conv conv_impl ('xla' vs 'pallas') on the judged
bench iteration (64² smoke, n=16, batch 8, staggered, TPU).

Timing protocol (CLAUDE.md): progress_multi donated-argument chains (state
changes every call) AND a value fetch of the last loss as the sync point —
plain block_until_ready on the axon tunnel does not reliably wait.
Arms are interleaved A/B/A/B… so tunnel drift and any concurrent chip load
hit both; compare the per-arm MIN.
"""
import json
import sys
import time

import numpy as np

import jax

import __graft_entry__
from __graft_entry__ import _make_app, _make_batch

H, N, B, ITERS = 64, 16, 8, 8


def build(conv_impl: str):
    app = _make_app(H, N, B, conv_impl=conv_impl)
    one = _make_batch(H, N, B)
    batches = jax.device_put(jax.tree_util.tree_map(
        lambda x: np.stack([x] * ITERS), one))
    jax.block_until_ready(batches)
    t0 = time.time()
    m = app.progress_multi(batches)
    _ = float(np.asarray(m["loss"])[-1])  # value-fetch sync
    compile_s = time.time() - t0
    return app, batches, compile_s


def trial(app, batches) -> float:
    t0 = time.time()
    m = app.progress_multi(batches)
    _ = float(np.asarray(m["loss"])[-1])  # value-fetch sync
    return (time.time() - t0) / ITERS


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    impls = sys.argv[2].split(",") if len(sys.argv) > 2 else ["xla", "pallas"]
    arms = {}
    for impl in impls:
        app, batches, compile_s = build(impl)
        trial(app, batches)  # second warmup (post-compile caches)
        arms[impl] = (app, batches)
        print(json.dumps({"arm": impl, "compile_s": round(compile_s, 1)}),
              flush=True)
    times = {k: [] for k in arms}
    for r in range(rounds):
        for impl, (app, batches) in arms.items():
            times[impl].append(trial(app, batches))
    for impl, ts in times.items():
        ms = sorted(t * 1e3 for t in ts)
        print(json.dumps({
            "arm": impl, "iter_ms_min": round(ms[0], 2),
            "iter_ms_med": round(ms[len(ms) // 2], 2),
            "iter_ms_all": [round(t, 2) for t in ms],
            "steps_per_sec_at_min": round(N * B / (ms[0] / 1e3), 1),
        }), flush=True)
