"""Inverse of snapshot_artifacts.py: repopulate the gitignored judged
artifacts from the committed artifacts/ mirror after a machine reset.

Round 3 saw TWO full VM replacements that wiped runs/ and
.bench_baseline.json; the snapshot mirror (committed) preserves the small
judge-relevant files. This restores them in place so that (a) the
`runs/...` paths cited throughout RESULTS.md resolve again and (b) a
committed CPU-comparator cache spares the ~35-min re-measure.

Existing files are never overwritten (live measurements beat snapshots).

Usage: python scripts/restore_artifacts.py
"""

from __future__ import annotations

import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "artifacts")


def main() -> None:
    restored, kept = [], 0
    for root, _dirs, files in os.walk(SRC):
        for name in files:
            src = os.path.join(root, name)
            rel = os.path.relpath(src, SRC)
            dst = os.path.join(REPO, rel)
            if os.path.exists(dst):
                kept += 1
                continue
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy2(src, dst)
            restored.append(rel)
    print(f"restored {len(restored)} files ({kept} already present):")
    for rel in restored:
        print(" ", rel)


if __name__ == "__main__":
    main()
