"""Native C++ scene loader: build, correctness vs NumPy, scene integration."""

import numpy as np
import pytest

from pde_control_tpu.data.native_loader import (
    gather_frames,
    native_available,
)
from pde_control_tpu.data.scene import SceneDataset


def test_native_builds_and_matches_numpy(tmp_path, rng):
    frames = [rng.normal(size=(7, 9, 1)).astype(np.float32) for _ in range(5)]
    paths = []
    for i, fr in enumerate(frames):
        p = str(tmp_path / f"f{i}.npy")
        np.save(p, fr)
        paths.append(p)
    out = gather_frames(paths, (7, 9, 1), n_threads=4)
    np.testing.assert_allclose(out, np.stack(frames), atol=0)
    # The toolchain exists in this image; the native path must actually
    # build (fallback would hide a broken build).
    assert native_available()


def test_scene_npy_roundtrip_native(tmp_path, rng):
    obs = rng.normal(size=(3, 4, 8, 8, 1)).astype(np.float32)
    root = str(tmp_path / "scenes_npy")
    ds = SceneDataset(root, sim_range=range(3))
    ds.write_trajectories(obs, fmt="npy")
    loaded = ds.load_trajectories()
    np.testing.assert_allclose(loaded.obs, obs, atol=0)


def test_gather_fallback_on_missing_file(tmp_path, rng):
    good = str(tmp_path / "a.npy")
    np.save(good, rng.normal(size=(4, 4)).astype(np.float32))
    with pytest.raises(Exception):
        gather_frames([good, str(tmp_path / "missing.npy")], (4, 4))
