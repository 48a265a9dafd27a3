"""Inverse of snapshot_artifacts.py: repopulate the gitignored judged
artifacts from the committed artifacts/ mirror after a machine reset.

Round 3 saw TWO full VM replacements that wiped runs/ and
.bench_baseline.json; the snapshot mirror (committed) preserves the small
judge-relevant files. This restores them in place so that (a) the
`runs/...` paths cited throughout RESULTS.md resolve again and (b) a
committed CPU-comparator cache spares the ~35-min re-measure.

Existing files are never overwritten (live measurements beat snapshots).
The restore walks ONLY the snapshot PATTERNS (ADVICE r3: a stray
non-mirror file committed under artifacts/ must not be copied into the
repo root), and fails loudly when the mirror is missing or empty.

Usage: python scripts/restore_artifacts.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from snapshot_artifacts import OUT as SRC, PATTERNS, REPO  # noqa: E402


def main() -> None:
    if not os.path.isdir(SRC):
        sys.exit(f"ERROR: no artifacts/ mirror at {SRC} — nothing to "
                 "restore (fresh clone of a branch without the snapshot?)")
    restored, kept = [], 0
    for pat in PATTERNS:
        for src in sorted(glob.glob(os.path.join(SRC, pat))):
            rel = os.path.relpath(src, SRC)
            dst = os.path.join(REPO, rel)
            if os.path.exists(dst):
                kept += 1
                continue
            os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
            shutil.copy2(src, dst)
            restored.append(rel)
    if not restored and not kept:
        sys.exit(f"ERROR: artifacts/ mirror at {SRC} matched no snapshot "
                 f"patterns {PATTERNS} — restore found nothing")
    print(f"restored {len(restored)} files ({kept} already present):")
    for rel in restored:
        print(" ", rel)


if __name__ == "__main__":
    main()
