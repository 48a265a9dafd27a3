"""VM/dataset epoch key (VERDICT r3 item 8: gate cross-reset
comparability in code, not prose).

Rollouts are chaotic, so "deterministically" regenerated datasets differ
across VM replacements (different chip/compiler rounding amplified over
the trajectory): absolute MSEs measured on different VMs are NOT
comparable — only controlled/zero-force ratios are. The epoch key
identifies the VM instance that generated a run's data; every
results.json / comparison.json / .bench_baseline.json is stamped with it,
and scripts/collect_results.py refuses to tabulate absolute MSEs across
epochs (ratios remain valid).
"""

from __future__ import annotations

import hashlib
import os


def vm_epoch() -> str:
    """Short stable identifier of this VM instance.

    /etc/machine-id survives reboots of one VM but changes on VM
    replacement — exactly the boundary across which dataset regeneration
    stops being bit-comparable. Falls back to the boot id (weaker: also
    changes on reboot) and finally to 'unknown'."""
    for path in ("/etc/machine-id", "/proc/sys/kernel/random/boot_id"):
        try:
            with open(path) as f:
                raw = f.read().strip()
            if raw:
                return hashlib.sha256(raw.encode()).hexdigest()[:12]
        except OSError:
            continue
    return "unknown"


def stamp(results: dict) -> dict:
    """Add the epoch key to a results dict (in place; returns it)."""
    results.setdefault("vm_epoch", vm_epoch())
    return results


def check_same_epoch(paths_epochs) -> list[str]:
    """Given (name, epoch) pairs, return the names whose epoch differs
    from the current VM's — the rows whose absolute MSEs must not be
    compared against freshly measured ones."""
    cur = vm_epoch()
    return [name for name, ep in paths_epochs if ep and ep != cur]
