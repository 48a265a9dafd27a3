"""Summarize runs/*/results.json + comparison.json into one table.

Usage: python scripts/collect_results.py [runs_root]
Prints controlled/zero-force final MSE (± sem when present), the ratio,
and mean |F| per run; scheme tables for compare_* dirs. Used to assemble
RESULTS.md without transcription errors.

Epoch gate (VERDICT r3 item 8): every results file is stamped with the
vm_epoch of the machine that measured it. Datasets regenerate differently
across VM replacements (chaotic rollouts amplify chip/compiler rounding),
so ABSOLUTE MSEs from other epochs are not comparable with fresh ones —
those rows print '†' with their absolute columns blanked; the
controlled/zero-force RATIO (measured within one epoch) is kept.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pde_control_tpu.utils.epoch import vm_epoch  # noqa: E402


def fmt(x):
    return f"{x:.3g}" if isinstance(x, (int, float)) else "-"


def main(root="runs"):
    cur = vm_epoch()
    rows = []
    stale_seen = False
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
            stale = r.get("vm_epoch") not in (None, cur)
            stale_seen |= stale
            mse = ev.get("final_state_mse")
            zf = ev.get("zero_force_final_mse")
            rows.append((name, mse, ev.get("final_state_mse_sem"),
                         zf, (zf / mse) if mse and zf else None,
                         ev.get("mean_abs_force"),
                         ev.get("val_set_size"), stale))
        elif os.path.exists(cj):
            with open(cj) as f:
                r = json.load(f)
            stale = r.get("vm_epoch") not in (None, cur)
            stale_seen |= stale
            for scheme, ev in r.items():
                if not isinstance(ev, dict):
                    continue  # file-level stamps (vm_epoch)
                mse = ev.get("final_state_mse")
                zf = ev.get("zero_force_final_mse")
                rows.append((f"{name}:{scheme}", mse,
                             ev.get("final_state_mse_sem"), zf,
                             (zf / mse) if mse and zf else None,
                             ev.get("mean_abs_force"),
                             ev.get("val_set_size"), stale))
    w = max(len(r[0]) for r in rows) if rows else 10
    print(f"{'run':{w}}  {'mse':>9} {'sem':>9} {'zeroF':>9} "
          f"{'ratio':>7} {'|F|':>9} {'nval':>5}")
    for name, mse, sem, zf, ratio, absf, nval, stale in rows:
        if stale:
            # Absolute MSEs from another VM epoch are NOT comparable with
            # fresh ones — refuse to tabulate them; the within-epoch ratio
            # survives.
            mse = sem = zf = None
            name = name + "†"
        print(f"{name:{w + (1 if stale else 0)}}  "
              f"{fmt(mse):>9} {fmt(sem):>9} {fmt(zf):>9} "
              f"{fmt(ratio):>7} {fmt(absf):>9} {nval or '-':>5}")
    if stale_seen:
        print("\n† measured on a different VM epoch: absolute MSEs blanked "
              "(datasets regenerate differently across VM replacements; "
              "only the controlled/zero-force ratio transfers). Files with "
              "no vm_epoch stamp (pre-round-4 snapshots) are tabulated "
              "as-is; every new run stamps.")


if __name__ == "__main__":
    main(*sys.argv[1:])
