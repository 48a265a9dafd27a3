"""Per-network parameter checkpoints.

Rebuild of the reference's load-bearing staging mechanism (SURVEY.md §3.4):
per-network `tf.train.Saver` checkpoints under var-scopes 'CFE'/'OPk' [R]
become per-collection msgpack files + a JSON manifest. Stages communicate
ONLY through these files, exactly like the reference's curriculum.

Format: <dir>/<NAME>.msgpack (flax serialization of that network's param
subtree) + <dir>/manifest.json recording names, shapes-hash and metadata.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

import flax.serialization
import jax


def _tree_hash(tree: Any) -> str:
    parts = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts.append(f"{jax.tree_util.keystr(path)}:{getattr(leaf, 'shape', ())}")
    return hashlib.sha1("|".join(sorted(parts)).encode()).hexdigest()[:12]


def save_networks(
    directory: str, params: dict[str, Any], metadata: dict | None = None
) -> None:
    """Save each top-level network subtree ('CFE', 'OP2', …) to its own file.

    Partial saves MERGE: per-stage curricula save each trained network into
    a shared dir one stage at a time (save(names=...)), so an existing
    manifest's entries for networks not being rewritten are kept."""
    os.makedirs(directory, exist_ok=True)
    manifest = {"networks": {}, "metadata": metadata or {}}
    manifest_path = os.path.join(directory, "manifest.json")
    if os.path.exists(manifest_path):
        try:
            with open(manifest_path) as f:
                prev = json.load(f)
            manifest["networks"] = {
                k: v for k, v in prev.get("networks", {}).items()
                if os.path.exists(os.path.join(directory, v.get("file", "")))}
        except (json.JSONDecodeError, OSError):
            pass
    for name, subtree in params.items():
        path = os.path.join(directory, f"{name}.msgpack")
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(subtree))
        manifest["networks"][name] = {"file": f"{name}.msgpack",
                                      "tree_hash": _tree_hash(subtree)}
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)


def load_network(path: str, target: Any) -> Any:
    """Load one network's params from a `.msgpack` FILE. (Directory
    handling — joining `<dir>/<name>.msgpack` — is the caller's job:
    see ControlTraining's restore-dict branch and restore_networks.)

    Raises on non-finite parameters: a stage restoring a NaN-poisoned
    checkpoint would train (and checkpoint) garbage for hours — fail at
    load time instead (round 3: a diverged CFE stage poisoned every later
    curriculum stage through exactly this path)."""
    import numpy as np

    with open(path, "rb") as f:
        out = flax.serialization.from_bytes(target, f.read())
    for p, leaf in jax.tree_util.tree_flatten_with_path(out)[0]:
        if not np.all(np.isfinite(leaf)):
            raise ValueError(
                f"checkpoint {path} has non-finite values at "
                f"{jax.tree_util.keystr(p)} — refusing to restore (the run "
                "that wrote it diverged; delete its workdir and retrain)")
    return out


def restore_networks(
    directory: str, params: dict[str, Any], names: list[str] | None = None
) -> dict[str, Any]:
    """Restore selected networks from a checkpoint dir into `params`."""
    out = dict(params)
    for name in names if names is not None else list(params):
        path = os.path.join(directory, f"{name}.msgpack")
        if os.path.exists(path):
            out[name] = load_network(path, params[name])
    return out


def save_training_state(directory: str, params: Any, opt_state: Any,
                        step: int, extra: dict | None = None) -> None:
    """Full resume checkpoint (params + optimizer state + step counter).

    The reference has no crash-resume story (SURVEY.md §5 'Failure
    detection': rerun the notebook); this is the rebuild's rerun-resume.
    """
    os.makedirs(directory, exist_ok=True)
    save_networks(os.path.join(directory, "networks"), params,
                  {"step": step, **(extra or {})})
    with open(os.path.join(directory, "opt_state.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(opt_state))
    with open(os.path.join(directory, "state.json"), "w") as f:
        json.dump({"step": step, **(extra or {})}, f)


def load_training_state(directory: str, params: Any, opt_state: Any):
    """Restore (params, opt_state, step) saved by save_training_state.
    `params`/`opt_state` are templates with the target structure."""
    params = restore_networks(os.path.join(directory, "networks"), params)
    with open(os.path.join(directory, "opt_state.msgpack"), "rb") as f:
        opt_state = flax.serialization.from_bytes(opt_state, f.read())
    with open(os.path.join(directory, "state.json")) as f:
        step = json.load(f)["step"]
    return params, opt_state, step
