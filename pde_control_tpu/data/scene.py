"""Scene-directory dataset I/O.

Rebuild of `phi/data/fluidformat.py :: Scene` + `BatchReader/Dataset` [R]
(SURVEY.md L5). On-disk layout preserved so users of the reference find the
same shape:

    <root>/sim_000000/<field>_000000.npz   (one array per field per frame)
    <root>/sim_000001/...

plus range-based train/val splits. For training-loop speed there's also an
in-memory `TrajectoryDataset` (arrays already stacked) — scene dirs load
into one via `SceneDataset.load_trajectories`.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

_SCENE_FMT = "sim_{:06d}"
_FRAME_FMT = "{}_{:06d}.npz"


class Scene:
    """One simulation directory holding per-frame field arrays."""

    def __init__(self, path: str):
        self.path = path

    @classmethod
    def create(cls, root: str, index: int) -> "Scene":
        path = os.path.join(root, _SCENE_FMT.format(index))
        os.makedirs(path, exist_ok=True)
        return cls(path)

    @classmethod
    def at(cls, root: str, index: int) -> "Scene":
        return cls(os.path.join(root, _SCENE_FMT.format(index)))

    def write_frame(self, fields: dict[str, np.ndarray], frame: int) -> None:
        for name, arr in fields.items():
            np.savez_compressed(
                os.path.join(self.path, _FRAME_FMT.format(name, frame)),
                data=np.asarray(arr),
            )

    def read_frame(self, names: Sequence[str], frame: int) -> dict[str, np.ndarray]:
        out = {}
        for name in names:
            with np.load(os.path.join(self.path, _FRAME_FMT.format(name, frame))) as z:
                out[name] = z["data"]
        return out

    def frame_count(self, name: str) -> int:
        n = 0
        while os.path.exists(os.path.join(self.path, _FRAME_FMT.format(name, n))):
            n += 1
        return n


class TrajectoryDataset:
    """In-memory trajectories: obs (num, T, *spatial, C) [+ extra arrays].

    `sample(rng, batch_size)` returns a batch dict with 'obs' (B, T, …) plus
    any extras, sliced on the same indices — the contract ControlTraining
    expects.
    """

    def __init__(self, obs: np.ndarray, **extras: np.ndarray):
        self.obs = np.asarray(obs)
        self.extras = {k: np.asarray(v) for k, v in extras.items()}
        for k, v in self.extras.items():
            assert v.shape[0] == self.obs.shape[0], k

    def __len__(self) -> int:
        return self.obs.shape[0]

    def sample(self, rng: np.random.Generator, batch_size: int) -> dict:
        idx = rng.integers(0, len(self), size=batch_size)
        batch = {"obs": self.obs[idx]}
        for k, v in self.extras.items():
            batch[k] = v[idx]
        return batch

    def slice(self, start: int, stop: int) -> "TrajectoryDataset":
        return TrajectoryDataset(
            self.obs[start:stop],
            **{k: v[start:stop] for k, v in self.extras.items()},
        )


class SceneDataset:
    """Range-based reader over a scene root (reference's Dataset+BatchReader)."""

    def __init__(self, root: str, field: str = "obs",
                 sim_range: range | None = None):
        self.root = root
        self.field = field
        if sim_range is None:
            count = 0
            while os.path.isdir(os.path.join(root, _SCENE_FMT.format(count))):
                count += 1
            sim_range = range(count)
        self.sim_range = sim_range

    def load_trajectories(self, frames: int | None = None) -> TrajectoryDataset:
        trajs = []
        for i in self.sim_range:
            scene = Scene.at(self.root, i)
            t = scene.frame_count(self.field) if frames is None else frames
            arr = np.stack(
                [scene.read_frame([self.field], f)[self.field] for f in range(t)]
            )
            trajs.append(arr)
        return TrajectoryDataset(np.stack(trajs))

    def write_trajectories(self, obs: np.ndarray) -> None:
        """obs: (num, T, *spatial, C) — write each trajectory as a scene."""
        for i, traj in enumerate(obs):
            scene = Scene.create(self.root, self.sim_range[i]
                                 if i < len(self.sim_range) else i)
            for f, frame in enumerate(traj):
                scene.write_frame({self.field: frame}, f)
