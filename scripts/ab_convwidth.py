"""Conv TFLOP/s vs channel width — the MXU-fill operating-point probe
(VERDICT r3 item 2).

Round-3 calibration: big bf16 matmuls sustain 157 TFLOP/s on this chip but
`conv_general_dilated` at the nets' shapes ((8, 64, 64, 32-64ch) bf16 3x3)
only ~13 TFLOP/s — a 12x lowering gap. Hypothesis: Cout <= 64 under-fills
the MXU lane dimension (128 lanes); Cout 128/256 should close part of the
gap. If wide convs sustain >=2x the narrow TFLOP/s, wider nets buy more
quality per wall-clock despite ~4x FLOPs — the Pareto study follows.

Timing protocol (CLAUDE.md): carry-chained convs (x feeds the next conv,
weights fixed, K applications inside one jit with donated x) AND a value
fetch from the output as the sync point — block_until_ready lies on the
axon tunnel for repeated identical dispatches. Widths are interleaved
per round so tunnel drift hits all arms.
"""
import functools
import json
import sys
import time

import numpy as np

import __graft_entry__  # noqa: F401  (compile cache)
import jax
import jax.numpy as jnp

B, H, K_CHAIN = 8, 64, 32
WIDTHS = (32, 64, 128, 256)
DN = ("NHWC", "HWIO", "NHWC")


@functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
def chain(x, w, k):
    for _ in range(k):
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=DN,
            preferred_element_type=jnp.bfloat16)
    return x


def build(c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H, H, c)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, (9 * c) ** -0.5, (3, 3, c, c)),
                    jnp.bfloat16)
    return x, w


def trial(x, w):
    t0 = time.time()
    x = chain(x, w, K_CHAIN)
    _ = float(x[0, 0, 0, 0])  # value-fetch sync
    return time.time() - t0, x


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    arms = {}
    for c in WIDTHS:
        x, w = build(c)
        t0 = time.time()
        _, x = trial(x, w)  # compile + warm
        arms[c] = (x, w)
        print(json.dumps({"arm": c, "compile_s": round(time.time() - t0, 1)}),
              flush=True)
    times = {c: [] for c in WIDTHS}
    for r in range(rounds):
        for c in WIDTHS:
            x, w = arms[c]
            dt, x = trial(x, w)
            arms[c] = (x, w)
            times[c].append(dt)
    for c in WIDTHS:
        best = min(times[c])
        flops = 2.0 * B * H * H * 9 * c * c * K_CHAIN
        print(json.dumps({
            "arm": c,
            "chain_ms_min": round(best * 1e3, 2),
            "tflops": round(flops / best / 1e12, 2),
            "chain_ms_all": [round(t * 1e3, 2) for t in sorted(times[c])],
        }), flush=True)
