"""Room-scale patch-based denoising engine.

TPU-native port of reference denoise_room.py:39-573:
  * FPS seed centers over the whole room (bucket FPS for millions of
    points),
  * KD-tree radius patches (scipy replaces sklearn),
  * pad-with-jittered-duplicates or FPS-split to exactly ``patch_size``
    points (fixed shapes for XLA),
  * batched bridge sampling — each batch of 32 patches is one scan
    program; patches are embarrassingly parallel and shard across chips
    via the batch axis (SURVEY.md §5 long-context),
  * overlap-averaged recomposition. The reference's numba running-mean
    kernels (denoise_room.py:181-289) become a vectorized sum/count
    accumulation (np.add.at); identical result up to the reference's
    duplicate-index fancy-assignment quirks, which its cut-lists already
    suppress.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from .metrics.chamfer import chamfer_distance
from .ops import bucket_fps

logger = logging.getLogger("p2pb")


def create_patches(
    room_points: np.ndarray,
    patch_size: int,
    idxs_radius_patches: List[np.ndarray],
    room_colors: Optional[np.ndarray] = None,
    room_features: Optional[np.ndarray] = None,
    rng: Optional[np.random.Generator] = None,
):
    """Fixed-size patches from ragged radius neighborhoods
    (reference denoise_room.py:352-421).

    Small neighborhoods are padded with jittered duplicates (noise scale
    = 1% of the patch bbox diagonal); large ones are FPS-split into
    ceil(n/patch_size)+... subsets of exactly patch_size points.

    Returns (xyz [P, S, 3], rgb, feats, idxs [P, S], cut_list [P]).
    """
    rng = rng or np.random.default_rng(0)
    xyz_list, rgb_list, feat_list, idx_list, cut_list = [], [], [], [], []

    for mapping in idxs_radius_patches:
        patch_xyz = room_points[mapping]
        patch_rgb = room_colors[mapping] if room_colors is not None else None
        patch_feat = room_features[mapping] if room_features is not None else None
        n = len(patch_xyz)
        diff = patch_size - n
        if n == 0:
            continue
        if diff > 0:
            ridx = rng.integers(0, n, diff)
            extra = patch_xyz[ridx]
            noise_level = np.linalg.norm(
                patch_xyz.max(axis=0) - patch_xyz.min(axis=0)
            ) * 1e-2
            extra = extra + rng.normal(0, noise_level, extra.shape)
            xyz_list.append(np.concatenate([patch_xyz, extra]).astype(np.float32))
            if patch_rgb is not None:
                rgb_list.append(np.concatenate([patch_rgb, patch_rgb[ridx]]))
            if patch_feat is not None:
                feat_list.append(np.concatenate([patch_feat, patch_feat[ridx]]))
            idx_list.append(np.concatenate([mapping, mapping[ridx]]))
            cut_list.append(n)  # padded tail excluded from recomposition
        else:
            fraction = n // patch_size + 1
            for f in range(fraction):
                sub = bucket_fps(patch_xyz, patch_size, seed=f)
                xyz_list.append(patch_xyz[sub].astype(np.float32))
                if patch_rgb is not None:
                    rgb_list.append(patch_rgb[sub])
                if patch_feat is not None:
                    feat_list.append(patch_feat[sub])
                idx_list.append(mapping[sub])
                cut_list.append(patch_size)

    xyz = np.stack(xyz_list)
    rgb = np.stack(rgb_list).astype(np.float32) if rgb_list else None
    feats = np.stack(feat_list).astype(np.float32) if feat_list else None
    idxs = np.stack(idx_list)
    return xyz, rgb, feats, idxs, np.asarray(cut_list)


def denoise_patch_batch(
    bridge,
    params,
    patch_xyz: np.ndarray,
    steps: int,
    patch_rgb: Optional[np.ndarray] = None,
    patch_feat: Optional[np.ndarray] = None,
    use_rgb: bool = False,
    use_feat: bool = False,
    return_steps: bool = False,
    filtering: bool = False,
    mesh=None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Normalize, sample, denormalize a [B, S, 3] patch batch
    (reference denoise_room.py:115-178).

    mesh: optional jax.sharding.Mesh — the patch batch is placed
    batch-axis-sharded over its "data" axis, so the sampler program runs
    SPMD across chips (patches are embarrassingly parallel, SURVEY §5;
    the reference has no multi-GPU inference). ``params`` must already
    be replicated on the mesh (denoise_room does this).

    filtering=True drops the 1% of denoised points per patch farthest
    from the (normalized) input patch before un-normalizing, and
    returns (denoised [B, S', 3], keep_mask [B, S]) instead of a chain.
    The reference implements this (denoise_room.py:163-171) but ships it
    hardcoded off (:494) with a missing re-scale assignment (:170); this
    version applies the un-normalization to the kept points."""
    center = patch_xyz.mean(axis=1, keepdims=True)
    patch = patch_xyz - center
    scale = np.linalg.norm(patch, axis=2, keepdims=True).max(axis=1, keepdims=True)
    patch = (patch / scale).astype(np.float32)

    x_cond = None
    if use_rgb and patch_rgb is not None:
        x_cond = patch_rgb
    if use_feat and patch_feat is not None:
        x_cond = patch_feat if x_cond is None else np.concatenate([x_cond, patch_feat], -1)

    xb = jnp.asarray(patch)
    cb = jnp.asarray(x_cond) if x_cond is not None else None
    if mesh is not None:
        from .parallel.mesh import batch_sharding

        xb = jax.device_put(xb, batch_sharding(mesh))
        if cb is not None:
            cb = jax.device_put(cb, batch_sharding(mesh))
    out = bridge.sample(params, xb, cb, steps=steps, log_count=steps)
    if filtering:
        n_out = int(patch.shape[1] * 0.01)
        x_pred = np.asarray(out["x_pred"])
        kept, mask = remove_outliers(x_pred, patch, n_out)
        return kept * scale + center, mask

    denoised = np.asarray(out["x_pred"]) * scale + center
    chain = None
    if return_steps:
        chain = np.asarray(out["x_chain"])  # [B, T, S, 3]
        chain = chain * scale[:, None] + center[:, None]
        chain = np.moveaxis(chain, 1, 0)  # [T, B, S, 3]
    return denoised, chain


class RunningMean:
    """Overlap-averaged accumulation over the room.

    The inner scatter loop runs in the native C++ runtime
    (runtime/native/recompose.cpp, replacing the reference's numba
    kernels denoise_room.py:181-289); numpy fallback without a
    toolchain."""

    def __init__(self, room_points: np.ndarray):
        self.sums = np.zeros((len(room_points), 3), dtype=np.float64)
        self.counts = np.zeros(len(room_points), dtype=np.int64)
        self.fallback = np.ascontiguousarray(room_points, np.float32)

    def update(self, patch_batch: np.ndarray, idxs_batch: np.ndarray,
               cut_list: np.ndarray) -> None:
        from .runtime import accumulate_running_mean

        accumulate_running_mean(
            self.sums, self.counts, patch_batch, idxs_batch, cut_list
        )

    def result(self, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        from .runtime import finalize_running_mean

        out, n_miss = finalize_running_mean(self.sums, self.counts, self.fallback)
        if n_miss:
            # never-updated points take random updated predictions
            # (denoise_room.py:551-557)
            logger.warning("There are %d points that did not get updated.", n_miss)
            rng = rng or np.random.default_rng(0)
            mask = self.counts == 0
            out[mask] = out[rng.choice(len(out), n_miss)]
        return out


def remove_outliers(gen: np.ndarray, ref: np.ndarray, num_outliers: int):
    """Drop the num_outliers points of gen farthest from ref
    (reference denoise_room.py:39-69). [B, N, 3] each."""
    d1, _, _, _ = chamfer_distance(jnp.asarray(gen), jnp.asarray(ref))
    d1 = np.asarray(d1)
    order = np.argsort(-d1, axis=-1)
    B, N = d1.shape
    mask = np.ones((B, N), bool)
    for b in range(B):
        mask[b, order[b, :num_outliers]] = False
    kept = gen[mask].reshape(B, N - num_outliers, -1)
    return kept, mask


def denoise_room(
    bridge,
    params,
    room_points: np.ndarray,
    steps: int = 5,
    k: int = 4,
    patch_size: int = 4096,
    batch_size: int = 32,
    query_radius: float = 0.3,
    room_colors: Optional[np.ndarray] = None,
    room_features: Optional[np.ndarray] = None,
    use_rgb: bool = False,
    use_feat: bool = False,
    average_predictions: bool = True,
    return_steps: bool = False,
    filter_outliers: bool = False,
    seed: int = 42,
    mesh=None,
) -> Dict[str, np.ndarray]:
    """Full room pipeline (reference denoise_room.py:424-573).

    filter_outliers enables the per-patch 1% outlier filter
    (reference :39-69,163-171,508-513); the filtered points' room
    indices are dropped from the overlap average.

    mesh: optional jax.sharding.Mesh to shard each patch batch over its
    "data" axis — one sampler program SPMD across chips (the reference
    parallelizes training only; room inference is single-GPU there).
    batch_size must divide evenly over the mesh."""
    if return_steps and filter_outliers:
        # the per-patch filter drops points, so fixed-shape per-step
        # accumulation is impossible; without this the "steps" output
        # would silently be the never-updated fallback (shuffled input)
        logger.warning(
            "return_steps is incompatible with filter_outliers; "
            "disabling intermediate-step outputs"
        )
        return_steps = False
    if mesh is not None:
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        if batch_size % n_dev:
            raise ValueError(
                f"batch_size {batch_size} must divide over the "
                f"{n_dev}-device mesh"
            )
        from .parallel.mesh import replicated

        params = jax.device_put(params, replicated(mesh))
    rng = np.random.default_rng(seed)
    n_seeds = int(np.ceil(room_points.shape[0] / patch_size) * k)
    logger.info("Room: %d points, %d seed patches, radius %.2f",
                len(room_points), n_seeds, query_radius)

    seed_idx = bucket_fps(room_points, n_seeds, seed=seed)
    centers = room_points[seed_idx]
    tree = cKDTree(room_points)
    idxs_radius = tree.query_ball_point(centers, r=query_radius, workers=-1)
    idxs_radius = [np.asarray(i, np.int64) for i in idxs_radius]

    xyz, rgb, feats, idxs, cuts = create_patches(
        room_points, patch_size, idxs_radius, room_colors, room_features, rng
    )
    logger.info("Created %d fixed-size patches", len(xyz))

    accum = RunningMean(room_points) if average_predictions else None
    accum_steps = [RunningMean(room_points) for _ in range(steps)] if return_steps else None
    collected = []

    P = len(xyz)
    # pad the LAST batch up to batch_size with repeats: keeps one XLA
    # program for all batches (fixed shapes), surplus rows are ignored
    for s in range(0, P, batch_size):
        e = min(s + batch_size, P)
        sel = np.arange(s, e)
        pad = batch_size - len(sel)
        if pad > 0:
            sel = np.concatenate([sel, np.full(pad, sel[-1])])
        d, chain = denoise_patch_batch(
            bridge, params, xyz[sel], steps,
            rgb[sel] if rgb is not None else None,
            feats[sel] if feats is not None else None,
            use_rgb, use_feat, return_steps and not filter_outliers,
            filtering=filter_outliers, mesh=mesh,
        )
        valid = e - s
        if filter_outliers:
            # chain holds the keep mask; subset each patch's room
            # indices to the kept points (reference :508-513)
            keep = chain
            kept_idxs = np.stack([idxs[s + i][keep[i]] for i in range(valid)])
            # padding duplicates sit at the patch tail, and boolean
            # masking preserves order, so the kept-real count is the
            # mask popcount over the first cut positions
            kept_cuts = np.asarray(
                [int(keep[i, : cuts[s + i]].sum()) for i in range(valid)]
            )
            if average_predictions:
                accum.update(d[:valid], kept_idxs, kept_cuts)
            else:
                collected.append(d[:valid].reshape(-1, 3))
            continue
        if average_predictions:
            accum.update(d[:valid], idxs[s:e], cuts[s:e])
            if return_steps:
                for t in range(len(chain)):
                    accum_steps[t].update(chain[t][:valid], idxs[s:e], cuts[s:e])
        else:
            collected.append(d[:valid].reshape(-1, 3))

    out: Dict[str, np.ndarray] = {}
    if average_predictions:
        out["denoised"] = accum.result(rng)
        if return_steps:
            out["steps"] = np.stack([a.result(rng) for a in accum_steps])
    else:
        flat = np.concatenate(collected)
        sub = bucket_fps(flat, len(room_points), seed=seed)
        out["denoised"] = flat[sub]
    return out
