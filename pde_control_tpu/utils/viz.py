"""Field visualization: PNG dumps + TensorBoard images.

Rebuild decision (SURVEY.md §3.5, §5): the reference's live Dash/Plotly web
GUI (`phi/viz/dash/` [R]) is replaced by matplotlib field renders saved to
disk and optionally streamed to TensorBoard — the right tool for headless
TPU training jobs (the web GUI is an explicit non-goal, SURVEY.md §7).
"""

from __future__ import annotations

import os

import numpy as np


def save_field_png(field: np.ndarray, path: str, title: str | None = None,
                   cmap: str = "viridis") -> None:
    """Render a 2D field (H, W) or a 1D field (N,) to a PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    field = np.asarray(field)
    if field.ndim == 3:  # volume → mid-depth slice
        field = field[field.shape[0] // 2]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig, ax = plt.subplots(figsize=(4, 4) if field.ndim == 2 else (6, 3))
    if field.ndim == 1:
        ax.plot(field)
        ax.grid(True, alpha=0.3)
    else:
        im = ax.imshow(field, origin="lower", cmap=cmap)
        fig.colorbar(im, ax=ax, fraction=0.046)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def save_trajectory_strip(frames: np.ndarray, path: str, every: int = 1,
                          cmap: str = "viridis") -> None:
    """Render a (T, H, W) trajectory as a horizontal strip of frames."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    frames = np.asarray(frames)[::every]
    t = len(frames)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig, axes = plt.subplots(1, t, figsize=(2 * t, 2.2))
    if t == 1:
        axes = [axes]
    vmin, vmax = float(frames.min()), float(frames.max())
    for i, (ax, fr) in enumerate(zip(axes, frames)):
        ax.imshow(fr, origin="lower", cmap=cmap, vmin=vmin, vmax=vmax)
        ax.set_title(f"t={i * every}", fontsize=8)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def save_comparison_png(fields: dict[str, np.ndarray], path: str,
                        cmap: str = "viridis") -> None:
    """Render named fields side by side (2D images on a shared color scale,
    or 1D curves overlaid on one axis) — the training-progress view."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in fields.items()}
    # 3D volumes: render the mid-depth slice (axis 0 = z).
    arrays = {k: (a[a.shape[0] // 2] if a.ndim == 3 else a)
              for k, a in arrays.items()}
    ndim = next(iter(arrays.values())).ndim
    if ndim == 1:
        fig, ax = plt.subplots(figsize=(6, 3))
        for name, arr in arrays.items():
            ax.plot(arr, label=name)
        ax.legend(fontsize=8)
        ax.grid(True, alpha=0.3)
    else:
        n = len(arrays)
        fig, axes = plt.subplots(1, n, figsize=(3 * n, 3.2))
        axes = [axes] if n == 1 else list(axes)
        vmin = min(a.min() for a in arrays.values())
        vmax = max(a.max() for a in arrays.values())
        for ax, (name, arr) in zip(axes, arrays.items()):
            ax.imshow(arr, origin="lower", cmap=cmap, vmin=vmin, vmax=vmax)
            ax.set_title(name, fontsize=9)
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def tb_image(logger, tag: str, field: np.ndarray, step: int) -> None:
    """Log a 2D field image to the MetricsLogger's TensorBoard writer."""
    tb = getattr(logger, "_tb", None)
    if tb is None:
        return
    f = np.asarray(field, np.float32)
    lo, hi = float(f.min()), float(f.max())
    norm = (f - lo) / (hi - lo + 1e-12)
    tb.add_image(tag, norm[None], step)  # (1, H, W) grayscale
