"""PUNet object-denoising dataset (score-denoise protocol).

Port of the reference PUNet pipeline (dataloaders/punet.py:210-445) to a
torch-free numpy host pipeline: .xyz clouds at three resolutions,
on-the-fly kNN patch pairs with per-patch recentering/rescaling. The
pytorch3d kNN is replaced by a scipy cKDTree per cloud (built once and
cached — the reference rebuilt its KNN structure every item).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
from scipy.spatial import cKDTree

from .transforms import Compose, standard_train_transforms, standard_train_transforms_clean


class PointCloudDataset:
    """Folder of .xyz clouds at one resolution (punet.py:210-234)."""

    def __init__(self, root, dataset, split, resolution, transform: Optional[Compose] = None):
        self.pcl_dir = os.path.join(root, dataset, "pointclouds", split, resolution)
        self.transform = transform
        self.pointclouds: List[np.ndarray] = []
        self.pointcloud_names: List[str] = []
        for fn in sorted(os.listdir(self.pcl_dir)):
            if fn[-3:] != "xyz":
                continue
            pcl = np.loadtxt(os.path.join(self.pcl_dir, fn), dtype=np.float32)
            self.pointclouds.append(pcl)
            self.pointcloud_names.append(fn[:-4])

    def __len__(self):
        return len(self.pointclouds)

    def get(self, idx: int, rng: np.random.Generator):
        data = {
            "pcl_clean": self.pointclouds[idx].copy(),
            "name": self.pointcloud_names[idx],
        }
        if self.transform is not None:
            data = self.transform(data, rng)
        return data


def make_patches_for_pcl_pair(pcl_a, pcl_b, patch_size, num_patches, ratio, rng):
    """Random-seed kNN patch pairs (punet.py:321-343).

    Seeds are drawn from pcl_a; patches are the patch_size NN in pcl_a
    and ratio*patch_size NN in pcl_b.
    Returns ([P, M, 3], [P, rM, 3]).
    """
    N = pcl_a.shape[0]
    seed_idx = rng.permutation(N)[:num_patches]
    seeds = pcl_a[seed_idx]
    tree_a = cKDTree(pcl_a)
    tree_b = cKDTree(pcl_b)
    _, idx_a = tree_a.query(seeds, k=patch_size)
    _, idx_b = tree_b.query(seeds, k=int(ratio * patch_size))
    return pcl_a[idx_a], pcl_b[idx_b]


class PairedPatchDataset:
    """On-the-fly paired patches (punet.py:346-422).

    Each item: pick a random resolution dataset, apply the transform
    stack (normalize + noise + scale + rotate), cut one kNN patch pair,
    recenter on the clean patch mean and rescale by the noisy patch max
    norm (punet.py:406-414).
    """

    def __init__(self, datasets, patch_ratio=1.0, patch_size=2048,
                 num_patches=1000, seed: int = 0):
        self.datasets = datasets
        self.len_datasets = sum(len(d) for d in datasets)
        self.patch_ratio = patch_ratio
        self.patch_size = patch_size
        self.num_patches = num_patches
        self.seed = seed

    def __len__(self):
        return self.len_datasets * self.num_patches

    def __getitem__(self, idx):
        rng = np.random.default_rng((self.seed, idx))
        dset = self.datasets[rng.integers(len(self.datasets))]
        data = dset.get(idx % len(dset), rng)
        pat_noisy, pat_clean = make_patches_for_pcl_pair(
            data["pcl_noisy"], data["pcl_clean"],
            self.patch_size, 1, self.patch_ratio, rng,
        )
        noisy, clean = pat_noisy[0], pat_clean[0]
        center = clean.mean(axis=0)
        noisy = noisy - center
        clean = clean - center
        scale = np.linalg.norm(noisy, axis=1).max()
        noisy = noisy / scale
        clean = clean / scale
        return {
            "noisy_points": noisy.astype(np.float32),
            "clean_points": clean.astype(np.float32),
            "center": center.astype(np.float32),
            "scale": np.float32(scale),
        }


def get_dataset(
    dataset_root,
    split,
    dataset="PUNet",
    noise_min=0.010,
    noise_max=0.020,
    aug_rotate=True,
    patch_size=2048,
    resolutions=("10000_poisson", "30000_poisson", "50000_poisson"),
    seed: int = 0,
):
    """Standard PUNet training dataset (punet.py:266-290)."""
    if noise_max > 0:
        transform = standard_train_transforms(
            noise_std_min=noise_min, noise_std_max=noise_max, rotate=aug_rotate
        )
    else:
        transform = standard_train_transforms_clean(rotate=aug_rotate)
    return PairedPatchDataset(
        datasets=[
            PointCloudDataset(dataset_root, dataset, split, r, transform)
            for r in resolutions
        ],
        patch_ratio=1.0,
        patch_size=patch_size,
        seed=seed,
    )
