"""Summarize runs/*/results.json + comparison.json into one table.

Usage: python scripts/collect_results.py [runs_root]
Prints controlled/zero-force final MSE (± sem when present), the ratio,
and mean |F| per run; scheme tables for compare_* dirs. Used to assemble
RESULTS.md without transcription errors.
"""
import json
import os
import sys


def fmt(x):
    return f"{x:.3g}" if isinstance(x, (int, float)) else "-"


def main(root="runs"):
    rows = []
    for name in sorted(os.listdir(root)):
        d = os.path.join(root, name)
        rj = os.path.join(d, "results.json")
        cj = os.path.join(d, "comparison.json")
        if os.path.exists(rj):
            with open(rj) as f:
                r = json.load(f)
            ev = r.get("eval", {})
            if not ev:
                continue
            mse = ev.get("final_state_mse")
            zf = ev.get("zero_force_final_mse")
            rows.append((name, mse, ev.get("final_state_mse_sem"),
                         zf, (zf / mse) if mse and zf else None,
                         ev.get("mean_abs_force"),
                         ev.get("val_set_size")))
        elif os.path.exists(cj):
            with open(cj) as f:
                r = json.load(f)
            for scheme, ev in r.items():
                mse = ev.get("final_state_mse")
                zf = ev.get("zero_force_final_mse")
                rows.append((f"{name}:{scheme}", mse,
                             ev.get("final_state_mse_sem"), zf,
                             (zf / mse) if mse and zf else None,
                             ev.get("mean_abs_force"),
                             ev.get("val_set_size")))
    w = max(len(r[0]) for r in rows) if rows else 10
    print(f"{'run':{w}}  {'mse':>9} {'sem':>9} {'zeroF':>9} "
          f"{'ratio':>7} {'|F|':>9} {'nval':>5}")
    for name, mse, sem, zf, ratio, absf, nval in rows:
        print(f"{name:{w}}  {fmt(mse):>9} {fmt(sem):>9} {fmt(zf):>9} "
              f"{fmt(ratio):>7} {fmt(absf):>9} {nval or '-':>5}")


if __name__ == "__main__":
    main(*sys.argv[1:])
