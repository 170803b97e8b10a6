"""Point-cloud visualization (reference: utils/visualize.py:166-212).

matplotlib 3D scatter grids for training monitoring; clouds over 10k
points are subsampled like the reference.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def visualize_pointcloud_batch(
    path: str,
    pointclouds,
    max_points: int = 10000,
    elev: float = 30.0,
    azim: float = 225.0,
    vmin: float = -1.0,
    vmax: float = 1.0,
) -> str:
    """Render a batch of clouds [B, N, 3] to a grid PNG. Returns path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pointclouds = np.asarray(pointclouds)
    if pointclouds.ndim == 2:
        pointclouds = pointclouds[None]
    if pointclouds.shape[-1] != 3:
        pointclouds = np.swapaxes(pointclouds, -1, -2)
    B = len(pointclouds)
    cols = min(B, 4)
    rows = (B + cols - 1) // cols
    fig = plt.figure(figsize=(3 * cols, 3 * rows))
    rng = np.random.default_rng(0)
    for i, pc in enumerate(pointclouds):
        if pc.shape[0] > max_points:
            pc = pc[rng.choice(pc.shape[0], max_points, replace=False)]
        ax = fig.add_subplot(rows, cols, i + 1, projection="3d")
        ax.scatter(pc[:, 0], pc[:, 2], pc[:, 1], s=0.5, c=pc[:, 2], cmap="viridis")
        ax.view_init(elev=elev, azim=azim)
        ax.set_xlim(vmin, vmax)
        ax.set_ylim(vmin, vmax)
        ax.set_zlim(vmin, vmax)
        ax.axis("off")
    plt.tight_layout()
    plt.savefig(path, dpi=100)
    plt.close(fig)
    return path


def visualize_voxels(out_file, voxels, num_shown: int = 16,
                     threshold: float = 0.5):
    """Voxel-occupancy grid figure (reference utils/visualize.py:105-127).

    Args:
      voxels: [B, r, r, r] or [B, 1, r, r, r] occupancy/feature grids;
        values are thresholded into booleans.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    voxels = np.asarray(voxels)
    if voxels.ndim == 5:
        voxels = voxels[:, 0] if voxels.shape[1] == 1 else voxels[..., 0]
    occ = voxels > threshold

    num_shown = min(num_shown, occ.shape[0])
    n = max(int(np.sqrt(num_shown)), 1)
    fig = plt.figure(figsize=(20, 20))
    for idx in range(min(num_shown, n * n)):
        ax = fig.add_subplot(n, n, idx + 1, projection="3d")
        ax.voxels(occ[idx], edgecolor="k", facecolors="green",
                  linewidth=0.1, alpha=0.5)
        ax.view_init()
        ax.axis("off")
    plt.savefig(out_file, bbox_inches="tight")
    plt.close(fig)
    return out_file
