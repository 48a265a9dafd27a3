"""Per-frame error curves for the execution-scheme comparisons.

Renders docs/images/hierarchy_n{N}.png from runs/compare_smoke_{N}/
comparison.json (per-frame curves exist for runs evaluated under the
round-3 rigor). The paper's divide-and-conquer claim made visible: at long
horizon the greedy chain accumulates mid-rollout error that the staggered
hierarchy avoids.

Usage: python scripts/plot_hierarchy.py [run ...]
       (default: compare_smoke_32 + compare_smoke_64 if present)
"""

from __future__ import annotations

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# Categorical slots in fixed order (validated default palette) for the
# schemes; the zero-force baseline is a reference line, not a series.
COLORS = {"chain_final": "#2a78d6", "staggered": "#eb6834",
          "refined": "#1baf7a"}
LABELS = {"chain_final": "greedy chain", "staggered": "staggered hierarchy",
          "refined": "prediction refinement"}


def plot(run: str, out_dir: str = "docs/images") -> str | None:
    path = os.path.join("runs", run, "comparison.json")
    if not os.path.exists(path):
        print(f"{run}: no comparison.json — skipped")
        return None
    with open(path) as f:
        d = json.load(f)
    if "per_frame_mse" not in d.get("staggered", {}):
        print(f"{run}: no per-frame curves (pre-rigor eval) — skipped")
        return None
    def fixed_curve(row: dict, key: str, final_key: str):
        # Runs evaluated before the round-3 eval_batch× fix stored
        # per-frame curves a uniform eval_batch× too small (their
        # final_state_mse was always correct; post-fix,
        # tests/test_curriculum.py pins pf[-1] == final MSE). Rescale by
        # the row's own final value so old and new runs plot identically.
        curve = row[key]
        final = row.get(final_key)
        if final and curve[-1] and abs(curve[-1] / final - 1) > 1e-3:
            scale = final / curve[-1]
            curve = [c * scale for c in curve]
        return curve

    n = len(d["staggered"]["per_frame_mse"])
    frames = range(1, n + 1)
    fig, ax = plt.subplots(figsize=(6.4, 4.0), dpi=150)
    if "per_frame_zero_force_mse" in d["staggered"]:
        zero = fixed_curve(d["staggered"], "per_frame_zero_force_mse",
                           "zero_force_final_mse")
        ax.plot(frames, zero, color="#9aa1ab", lw=1.6, ls="--", zorder=1)
        ax.annotate("zero force", (frames[-1], zero[-1]),
                    xytext=(4, 0), textcoords="offset points",
                    color="#6b7280", fontsize=8, va="center")
    for scheme in ("chain_final", "staggered", "refined"):
        # comparison.json is written incrementally (crash recovery): a
        # partially-flushed file may be missing later schemes — plot what
        # exists.
        if "per_frame_mse" not in d.get(scheme, {}):
            print(f"{run}: {scheme} row missing/incomplete — omitted")
            continue
        curve = fixed_curve(d[scheme], "per_frame_mse", "final_state_mse")
        ax.plot(frames, curve, color=COLORS[scheme], lw=2,
                label=LABELS[scheme], zorder=2)
        ax.annotate(f"{curve[-1]:.2e}", (frames[-1], curve[-1]),
                    xytext=(4, 0), textcoords="offset points",
                    color=COLORS[scheme], fontsize=8, va="center")
    ax.set_yscale("log")
    ax.set_xlabel("frame")
    ax.set_ylabel("observation MSE vs ground truth")
    ax.set_title(f"2D smoke, indirect control, n={n}: per-frame error",
                 fontsize=11)
    ax.legend(frameon=False, fontsize=9, loc="lower right")
    ax.grid(True, which="major", color="#e5e7eb", lw=0.6)
    ax.spines[["top", "right"]].set_visible(False)
    ax.margins(x=0.12)
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"hierarchy_n{n}.png")
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    print("wrote", out)
    return out


if __name__ == "__main__":
    runs = sys.argv[1:] or ["compare_smoke_32", "compare_smoke_long",
                            "compare_smoke_64"]
    for r in runs:
        plot(r)
