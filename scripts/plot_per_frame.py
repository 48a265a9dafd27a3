"""Per-frame controlled-vs-zero-force error curves for curriculum runs.

Renders docs/images/per_frame_<run>.png from runs/<run>/results.json
(eval.per_frame_mse / per_frame_zero_force_mse, present for runs
evaluated under the round-3 rigor).

Usage: python scripts/plot_per_frame.py [run ...]
"""

from __future__ import annotations

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

TITLES = {
    "natural_flow_128_r3": "128-step forced-flow reconstruction (64², n=128)",
    "natural_flow_128_final": "128-step forced-flow reconstruction "
                              "(64², n=128, 3584 traj)",
    "smoke3d_indirect": "3D smoke, indirect control (32³, n=16)",
    "smoke3d_indirect2": "3D smoke, indirect control (32³, n=16, retuned)",
    "smoke3d_indirect_ft": "3D smoke, indirect (32³, n=16, reg-annealed)",
    "smoke3d_indirect_ft2": "3D smoke, indirect (32³, n=16, anneal step 2)",
    "smoke_128": "2D smoke, indirect control (128², n=16)",
    "smoke_128_ft": "2D smoke, indirect (128², n=16, reg-annealed)",
    "natural_flow_128_ft": "128-step reconstruction (reg-annealed)",
}


def plot(run: str, out_dir: str = "docs/images") -> str | None:
    path = os.path.join("runs", run, "results.json")
    if not os.path.exists(path):
        return None
    ev = json.load(open(path)).get("eval", {})
    if "per_frame_mse" not in ev:
        print(f"{run}: no per-frame curves — skipped")
        return None

    def fixed(key: str, final_key: str):
        # Pre-fix runs stored per-frame curves a uniform eval_batch× too
        # small (see scripts/plot_hierarchy.py); rescale to the row's own
        # final value.
        curve, final = ev[key], ev.get(final_key)
        if final and curve[-1] and abs(curve[-1] / final - 1) > 1e-3:
            curve = [c * final / curve[-1] for c in curve]
        return curve

    curve = fixed("per_frame_mse", "final_state_mse")
    zero = fixed("per_frame_zero_force_mse", "zero_force_final_mse")
    n = len(curve)
    frames = range(1, n + 1)
    fig, ax = plt.subplots(figsize=(6.4, 4.0), dpi=150)
    ax.plot(frames, zero, color="#9aa1ab", lw=1.6, ls="--", zorder=1)
    ax.annotate("zero force", (frames[-1], zero[-1]), xytext=(4, 0),
                textcoords="offset points", color="#6b7280", fontsize=8,
                va="center")
    ax.plot(frames, curve, color="#2a78d6", lw=2, zorder=2)
    ax.annotate(f"controlled\n{curve[-1]:.2e}", (frames[-1], curve[-1]),
                xytext=(4, 0), textcoords="offset points", color="#2a78d6",
                fontsize=8, va="center")
    ax.set_yscale("log")
    ax.set_xlabel("frame")
    ax.set_ylabel("observation MSE vs ground truth")
    ratio = ev["zero_force_final_mse"] / ev["final_state_mse"]
    ax.set_title(f"{TITLES.get(run, run)} — final ratio {ratio:.1f}×",
                 fontsize=11)
    ax.grid(True, which="major", color="#e5e7eb", lw=0.6)
    ax.spines[["top", "right"]].set_visible(False)
    ax.margins(x=0.14)
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"per_frame_{run}.png")
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    print("wrote", out)
    return out


if __name__ == "__main__":
    runs = sys.argv[1:] or ["natural_flow_128_r3", "smoke3d_indirect",
                            "smoke_128"]
    for r in runs:
        plot(r)
