"""Torch checkpoint compatibility: convert reference P2P-Bridge weights
into this framework's flax parameter tree.

The reference stores torch state_dicts (models/model_loader.py:115-162);
this module maps every parameter by construction of the two naming
schemes (see p2p_bridge_tpu/models/unet_pvc.py vs reference
models/unet_pvc.py) and transposes tensors between torch's
channels-first conv layouts and flax's channels-last kernels:

  Linear  [out, in]          -> kernel [in, out]
  Conv1d  [out, in, 1]       -> kernel [in, out]
  Conv2d  [out, in, 1, 1]    -> kernel [in, out]
  Conv3d  [out, in, k, k, k] -> kernel [k, k, k, in, out]
  GroupNorm weight/bias      -> scale/bias

Also provides ``load_reference_model``: runs the reference torch model
on CPU by stubbing its CUDA extension wrappers with numpy/torch
implementations of identical semantics — used for numerical parity
tests and for converting pretrained checkpoints.
"""

from __future__ import annotations

import sys
import types
from typing import Any, Dict

import numpy as np


# ======================================================================
# name mapping
# ======================================================================
def _torch_key(flax_path, conv_counts) -> str:
    """Map one flax param path (tuple of names, without the trailing
    kernel/bias leaf) to the torch parameter prefix."""
    top = flax_path[0]
    rest = flax_path[1:]

    def adagn(prefix, node, leafmod):
        # node like ("AdaGN_0", "GroupNorm_0"|"Dense_0")
        inner = "norm" if node[1].startswith("GroupNorm") else "emd"
        return f"{prefix}.{leafmod}.{inner}"

    if top == "embedf":
        k = int(rest[0].split("_")[1])
        return f"embedf.{0 if k == 0 else 2}"
    if top == "embed_feats_0":
        return "embed_feats.0"
    if top == "embed_feats_gn":
        return "embed_feats.1"
    if top == "embed_feats_1":
        return "embed_feats.3"
    if top == "global_pnet":
        m = int(rest[0].split("_")[1]) + 1  # MyGroupNormMLP_{0,1} -> mlp{1,2}
        sub = rest[1]
        k = int(sub.split("_")[1])
        base = f"global_pnet.mlp{m}.shared_mlp_{k}.mlp"
        if sub.startswith("Dense"):
            return f"{base}.0"
        return f"{base}.1.group_norm"
    if top == "global_att":
        return f"global_att.{rest[0]}"
    if top == "classifier_mlp":
        if rest[0].startswith("Dense"):
            return "classifier.0.layers.0"
        return "classifier.0.layers.1"
    if top == "classifier_out":
        return "classifier.2"

    # sa{i}_conv{j} / sa{i}_module / fp{j}_module / fp{j}_conv{k}
    if top.startswith("sa") and "_conv" in top:
        i, j = int(top[2:].split("_conv")[0]), int(top.split("_conv")[1])
        nconvs = conv_counts["sa"][i]
        prefix = f"sa_layers.{i}.{j}" if nconvs + 1 > 1 else f"sa_layers.{i}"
        return _pvconv_key(prefix, rest)
    if top.startswith("sa") and top.endswith("_module"):
        i = int(top[2:].split("_")[0])
        nconvs = conv_counts["sa"][i]
        prefix = f"sa_layers.{i}.{nconvs}" if nconvs > 0 else f"sa_layers.{i}"
        return _shared_mlp_key(f"{prefix}.mlps.0.layers", rest[1:])
    if top.startswith("fp") and top.endswith("_module"):
        j = int(top[2:].split("_")[0])
        nconvs = conv_counts["fp"][j]
        prefix = f"fp_layers.{j}.0" if nconvs > 0 else f"fp_layers.{j}"
        return _shared_mlp_key(f"{prefix}.mlp.layers", rest[1:])
    if top.startswith("fp") and "_conv" in top:
        j, k = int(top[2:].split("_conv")[0]), int(top.split("_conv")[1])
        prefix = f"fp_layers.{j}.{k + 1}"
        return _pvconv_key(prefix, rest)
    raise KeyError(f"unmapped flax module: {flax_path}")


def _pvconv_key(prefix, rest) -> str:
    node = rest[0]
    if node == "vconv1":
        return f"{prefix}.voxel_layers.0"
    if node == "vconv2":
        return f"{prefix}.voxel_layers.4"
    if node == "vnorm1":
        return _norm_key(f"{prefix}.voxel_layers.1", rest[1:])
    if node == "vnorm2":
        return _norm_key(f"{prefix}.voxel_layers.5", rest[1:])
    if node == "SE_0":
        k = int(rest[1].split("_")[1])
        return f"{prefix}.voxel_layers.6.fc.{0 if k == 0 else 2}"
    if node == "point_features":
        sub = rest[1]
        if sub.startswith("Dense"):
            return f"{prefix}.point_features.layers.0"
        return _norm_key(f"{prefix}.point_features.layers.1", rest[2:])
    if node == "attn":
        return f"{prefix}.attn.{rest[1]}"
    raise KeyError(f"unmapped PVConv node: {prefix} {rest}")


def _norm_key(prefix, rest) -> str:
    """AdaGN (GroupNorm_0 + Dense_0 children) or plain GroupNorm."""
    if not rest:  # plain GroupNorm leaf module
        return prefix
    inner = rest[0]
    if inner.startswith("GroupNorm"):
        return f"{prefix}.norm"
    if inner.startswith("Dense"):
        return f"{prefix}.emd"
    raise KeyError(f"unmapped norm node: {prefix} {rest}")


def _shared_mlp_key(base, rest) -> str:
    node = rest[0]
    k = int(node.split("_")[1])
    if node.startswith("Dense"):
        return f"{base}.{3 * k}"
    # AdaGN_k -> layers.{3k+1}
    return _norm_key(f"{base}.{3 * k + 1}", rest[1:])


def _transform(torch_w: np.ndarray, leaf_name: str) -> np.ndarray:
    w = np.asarray(torch_w)
    if leaf_name in ("scale",):
        return w
    if leaf_name == "bias":
        return w
    # kernel
    if w.ndim == 2:  # Linear
        return w.T
    if w.ndim == 3:  # Conv1d kx1
        return w[:, :, 0].T
    if w.ndim == 4:  # Conv2d 1x1
        return w[:, :, 0, 0].T
    if w.ndim == 5:  # Conv3d
        return w.transpose(2, 3, 4, 1, 0)
    raise ValueError(f"unexpected weight rank {w.ndim}")


def convert_torch_state_dict(state_dict: Dict[str, Any], flax_variables) -> Any:
    """Fill a flax variables tree with reference torch weights.

    Args:
      state_dict: torch name -> array (torch tensors or numpy).
      flax_variables: the template (from model.init) whose structure and
        shapes define the target.
    Returns:
      The converted variables pytree. Raises on any unmapped/mismatched
      parameter.
    """
    import jax

    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }

    flat = jax.tree_util.tree_flatten_with_path(flax_variables)[0]
    # conv counts per stage for Sequential indexing
    conv_counts = {"sa": {}, "fp": {}}
    for path, _ in flat:
        name = path[1].key
        if "_conv" in name and (name.startswith("sa") or name.startswith("fp")):
            kind = name[:2]
            stage = int(name[2:].split("_conv")[0])
            j = int(name.split("_conv")[1])
            conv_counts[kind][stage] = max(conv_counts[kind].get(stage, 0), j + 1)
        elif name.endswith("_module") and name.startswith(("sa", "fp")):
            kind = name[:2]
            stage = int(name[2:].split("_")[0])
            conv_counts[kind].setdefault(stage, 0)

    out = {}
    for path, leaf in flat:
        names = tuple(p.key for p in path)
        assert names[0] == "params"
        leaf_name = names[-1]  # kernel / bias / scale
        prefix = _torch_key(names[1:-1], conv_counts)
        torch_name = {
            "kernel": "weight", "scale": "weight", "bias": "bias"
        }[leaf_name]
        key = f"{prefix}.{torch_name}"
        if key not in sd:
            raise KeyError(f"torch checkpoint missing {key} (for {'/'.join(names)})")
        w = _transform(sd[key], leaf_name)
        if tuple(w.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch for {key}: torch {w.shape} vs flax {leaf.shape}"
            )
        out[names] = w.astype(np.float32)

    treedef = jax.tree_util.tree_structure(flax_variables)
    ordered = [out[tuple(p.key for p in path)] for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, ordered)


# ======================================================================
# reference model on CPU (stubbed CUDA ops)
# ======================================================================
def install_reference_op_stubs() -> None:
    """Make ``third_party.openpoints.models.layers`` importable with
    torch-CPU implementations of the 6 CUDA wrappers (exact semantics of
    SURVEY.md §2.4), plus the reference's other missing deps."""
    import torch

    def avg_voxelize(features, coords, r):
        B, C, N = features.shape
        flat = (coords[:, 0] * r * r + coords[:, 1] * r + coords[:, 2]).long()
        out = torch.zeros(B, C, r**3, dtype=features.dtype)
        cnt = torch.zeros(B, r**3, dtype=features.dtype)
        for b in range(B):
            out[b].index_add_(1, flat[b], features[b])
            cnt[b].index_add_(0, flat[b], torch.ones(N))
        return (out / cnt.clamp(min=1).unsqueeze(1)).reshape(B, C, r, r, r)

    def trilinear_devoxelize(grid, coords, r, training=True):
        B, C = grid.shape[:2]
        flat = grid.reshape(B, C, r**3)
        lo = torch.floor(coords)
        frac = coords - lo
        lo = lo.long()
        out = torch.zeros(B, C, coords.shape[2], dtype=grid.dtype)
        for cx in (0, 1):
            wx = frac[:, 0] if cx else 1 - frac[:, 0]
            ox = (frac[:, 0] > 0).long() * r * r if cx else 0
            for cy in (0, 1):
                wy = frac[:, 1] if cy else 1 - frac[:, 1]
                oy = (frac[:, 1] > 0).long() * r if cy else 0
                for cz in (0, 1):
                    wz = frac[:, 2] if cz else 1 - frac[:, 2]
                    oz = (frac[:, 2] > 0).long() if cz else 0
                    idx = lo[:, 0] * r * r + lo[:, 1] * r + lo[:, 2] + ox + oy + oz
                    w = (wx * wy * wz).unsqueeze(1)
                    out = out + w * torch.gather(
                        flat, 2, idx.unsqueeze(1).expand(-1, C, -1)
                    )
        return out

    def furthest_point_sample_pvcnn(coords, M):
        B, _, N = coords.shape
        pts = coords.transpose(1, 2)
        sel = torch.zeros(B, M, dtype=torch.long)
        for b in range(B):
            dists = torch.full((N,), float("inf"))
            last = 0
            for j in range(1, M):
                d = ((pts[b] - pts[b, last]) ** 2).sum(-1)
                dists = torch.minimum(dists, d)
                last = int(torch.argmax(dists))
                sel[b, j] = last
        return torch.stack([coords[b, :, sel[b]] for b in range(B)])

    def ball_query(centers, points, radius, K):
        B, _, M = centers.shape
        out = torch.zeros(B, M, K, dtype=torch.long)
        c = centers.transpose(1, 2)
        p = points.transpose(1, 2)
        for b in range(B):
            d2 = ((c[b][:, None] - p[b][None]) ** 2).sum(-1)
            for m in range(M):
                hits = torch.nonzero(d2[m] < radius * radius).flatten()
                if len(hits):
                    out[b, m, :] = hits[0]
                    out[b, m, : min(K, len(hits))] = hits[:K]
        return out

    def pvcnn_grouping(features, idx):
        B, C, _ = features.shape
        M, K = idx.shape[1:]
        flat = idx.reshape(B, -1)
        g = torch.gather(features, 2, flat.unsqueeze(1).expand(-1, C, -1))
        return g.reshape(B, C, M, K)

    def nearest_neighbor_interpolate(points, centers, feats):
        B, _, N = points.shape
        outs = []
        for b in range(B):
            d = ((points[b].T[:, None] - centers[b].T[None]) ** 2).sum(-1)
            d3, i3 = torch.topk(-d, k=min(3, d.shape[1]), dim=1)
            d3 = (-d3).clamp(1e-10, 1e10)
            if d3.shape[1] < 3:
                pad = 3 - d3.shape[1]
                d3 = torch.cat([d3, torch.full((N, pad), 1e10)], 1)
                i3 = torch.cat([i3, torch.zeros(N, pad, dtype=i3.dtype)], 1)
            prods = torch.stack(
                [d3[:, 1] * d3[:, 2], d3[:, 0] * d3[:, 2], d3[:, 0] * d3[:, 1]], 1
            )
            w = prods / prods.sum(1, keepdim=True)
            f = feats[b][:, i3]  # [C, N, 3]
            outs.append((f * w.unsqueeze(0)).sum(-1))
        return torch.stack(outs)

    stub = types.ModuleType("third_party.openpoints.models.layers")
    stub.avg_voxelize = avg_voxelize
    stub.trilinear_devoxelize = trilinear_devoxelize
    stub.furthest_point_sample_pvcnn = furthest_point_sample_pvcnn
    stub.ball_query = ball_query
    stub.pvcnn_grouping = pvcnn_grouping
    stub.nearest_neighbor_interpolate = nearest_neighbor_interpolate
    for name in (
        "third_party", "third_party.openpoints", "third_party.openpoints.models"
    ):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["third_party.openpoints.models.layers"] = stub

    for name in ("loguru", "ema_pytorch", "omegaconf", "wandb"):
        if name in sys.modules:
            continue
        m = types.ModuleType(name)
        if name == "loguru":
            class _Logger:
                def __getattr__(self, k):
                    return lambda *a, **kw: None

            m.logger = _Logger()
        if name == "ema_pytorch":
            m.EMA = object
        if name == "omegaconf":
            m.DictConfig = dict
            m.OmegaConf = object
        sys.modules[name] = m


class _C(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def _wrap_cfg(d):
    return _C({k: _wrap_cfg(v) for k, v in d.items()}) if isinstance(d, dict) else d


def load_reference_model(cfg_dict: Dict, reference_root: str = "/root/reference"):
    """Instantiate the reference torch PVCNN2Unet on CPU."""
    install_reference_op_stubs()
    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)
    from models.unet_pvc import PVCNN2Unet as TorchUnet  # noqa: PLC0415

    model = TorchUnet(_wrap_cfg(cfg_dict))
    model.eval()
    return model


def load_reference_bridge(cfg_dict: Dict, model,
                          reference_root: str = "/root/reference"):
    """Instantiate the reference torch P2PB bridge on CPU
    (reference models/p2pb.py:72-149), for sampler-chain parity tests.

    models/loss.py imports the CUDA auction-EMD package at module scope;
    only the mse loss is exercised here, so that subtree is stubbed.
    Requires cfg model.ema == False (ema_pytorch is stubbed)."""
    install_reference_op_stubs()
    for name in ("metrics", "metrics.emd_assignment"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "metrics.emd_assignment.emd_module" not in sys.modules:
        m = types.ModuleType("metrics.emd_assignment.emd_module")
        m.emdModule = object
        sys.modules["metrics.emd_assignment.emd_module"] = m
        sys.modules["metrics.emd_assignment"].emd_module = m
    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)
    from models.p2pb import P2PB  # noqa: PLC0415

    bridge = P2PB(_wrap_cfg(cfg_dict), model)
    bridge.eval()
    return bridge
