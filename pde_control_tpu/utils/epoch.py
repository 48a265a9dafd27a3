"""VM/dataset epoch key (VERDICT r3 item 8: gate cross-reset
comparability in code, not prose).

Rollouts are chaotic, so "deterministically" regenerated datasets differ
across VM replacements (different chip/compiler rounding amplified over
the trajectory): absolute MSEs measured on different VMs are NOT
comparable — only controlled/zero-force ratios are. The epoch key
identifies the wipe generation that a run's data belongs to; every
results.json / comparison.json / .bench_baseline.json is stamped with it,
and scripts/collect_results.py refuses to tabulate absolute MSEs across
epochs (ratios remain valid).

Round-4 correction (measured 2026-08-20, after the FOURTH reset):
/etc/machine-id is baked into the VM image and came back IDENTICAL across
a full machine replacement (hash 3457a4264f6f on both sides of the wipe),
so the original machine-id key under-detects exactly the boundary it was
built for. The boundary that actually matters is the wipe of the
gitignored state (`runs/`, `data/`, caches) — so the epoch now IS a
gitignored file: a random token minted on first use and destroyed by the
same wipe that invalidates the datasets. Reboots that preserve the
filesystem keep the epoch; anything that wipes the datasets rotates it.
Falls back to the machine-id hash if the repo root is unwritable.
"""

from __future__ import annotations

import errno
import hashlib
import os
import uuid

_EPOCH_FILE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".vm_epoch")


def _machine_id_epoch() -> str:
    for path in ("/etc/machine-id", "/proc/sys/kernel/random/boot_id"):
        try:
            with open(path) as f:
                raw = f.read().strip()
            if raw:
                return hashlib.sha256(raw.encode()).hexdigest()[:12]
        except OSError:
            continue
    return "unknown"


def vm_epoch(path: str = _EPOCH_FILE) -> str:
    """Short identifier of the current dataset/wipe generation.

    Reads the gitignored epoch file, minting it atomically when the last
    wipe destroyed it: the token is fully written to a temp file, then
    os.link()ed into place — link is atomic AND refuses to clobber an
    existing path (EEXIST), so a concurrent reader either sees no file or
    a COMPLETE token, never the empty window between O_CREAT and the
    content write that could make two same-generation processes stamp
    different epochs (ADVICE r4). Losers of the link race re-read the
    winner's token."""
    def _read() -> str | None:
        try:
            with open(path) as f:
                v = f.read().strip()
            return v or None
        except OSError:
            return None

    v = _read()
    if v:
        return v
    token = uuid.uuid4().hex[:12]
    # uuid-keyed tmp (not pid): a stale tmp from a crashed process + PID
    # reuse would otherwise EEXIST here and spuriously take the
    # machine-id fallback while the epoch file still doesn't exist.
    tmp = f"{path}.tmp.{token}"
    try:
        fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
        with os.fdopen(fd, "w") as f:
            f.write(token)
        try:
            os.link(tmp, path)  # atomic publish; EEXIST = lost the race
        except OSError as e:
            if e.errno != errno.EEXIST:
                raise
        finally:
            os.unlink(tmp)
        return _read() or _machine_id_epoch()
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        # Repo root unwritable: fall back to the machine-id hash.
        return _read() or _machine_id_epoch()


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
