"""A/B net WIDTH on the judged bench iteration (64² smoke, n=16, batch 8,
staggered, TPU) — the MXU-fill operating-point lever (VERDICT r3 item 2).

scripts/ab_convwidth.py measured chained-conv wall-clock nearly FLAT in
channel width (C 64→256: 2.8→39.7 TFLOP/s at ~equal ms). This measures the
consequence end to end: the full training iteration at width multipliers
1/2/4 on CFE features (32,64,64,32) and OP base 16. If 2× width costs
<<2× wall-clock, the Pareto move is training wider nets — more model
capacity per second — rather than chasing a faster narrow conv.

Timing protocol (CLAUDE.md): progress_multi donated-argument chains +
value-fetch sync; arms interleaved per round; compare per-arm MIN.
"""
import json
import sys
import time

import numpy as np

import __graft_entry__  # noqa: F401
from __graft_entry__ import _make_app, _make_batch

import jax

H, N, B, ITERS = 64, 16, 8, 8


def build(width: int):
    app = _make_app(H, N, B, width=width)
    one = _make_batch(H, N, B)
    batches = jax.device_put(jax.tree_util.tree_map(
        lambda x: np.stack([x] * ITERS), one))
    jax.block_until_ready(batches)
    t0 = time.time()
    m = app.progress_multi(batches)
    _ = float(np.asarray(m["loss"])[-1])  # value-fetch sync
    return app, batches, time.time() - t0


def trial(app, batches) -> float:
    t0 = time.time()
    m = app.progress_multi(batches)
    _ = float(np.asarray(m["loss"])[-1])
    return (time.time() - t0) / ITERS


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    widths = ([int(x) for x in sys.argv[2].split(",")]
              if len(sys.argv) > 2 else [1, 2, 4])
    arms = {}
    for wd in widths:
        app, batches, compile_s = build(wd)
        trial(app, batches)  # second warmup
        arms[wd] = (app, batches)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(app.params))
        print(json.dumps({"arm": wd, "compile_s": round(compile_s, 1),
                          "params": int(n_params)}), flush=True)
    times = {wd: [] for wd in widths}
    for r in range(rounds):
        for wd, (app, batches) in arms.items():
            times[wd].append(trial(app, batches))
    base = None
    for wd in widths:
        ms = sorted(t * 1e3 for t in times[wd])
        if base is None:
            base = ms[0]
        print(json.dumps({
            "arm": wd, "iter_ms_min": round(ms[0], 2),
            "iter_ms_med": round(ms[len(ms) // 2], 2),
            "vs_width1": round(ms[0] / base, 3),
            "steps_per_sec_at_min": round(N * B / (ms[0] / 1e3), 1),
            "iter_ms_all": [round(t, 2) for t in ms],
        }), flush=True)
