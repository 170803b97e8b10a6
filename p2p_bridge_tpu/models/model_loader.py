"""Model/bridge construction and checkpointing.

TPU-native equivalent of reference models/model_loader.py:13-219:
  * builds the backbone + bridge from config,
  * orbax checkpoints holding {params, ema, opt_state, step} — the
    checkpoint directory plus the co-saved ``opt.yaml`` is the deployable
    artifact, same convention as the reference (train.py:210-217,
    SURVEY.md §5 checkpoint/resume),
  * resume (restores optimizer unless --restart, model_loader.py:115-162)
    and adaptive partial loads for mismatched configs.
"""

from __future__ import annotations

import logging
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from ..utils.config import Config
from .p2pb import P2PBridge
from .unet_pvc import build_unet_from_config

logger = logging.getLogger("p2pb")


def load_model(cfg):
    """Build the backbone (model_loader.py:64-78)."""
    model = build_unet_from_config(cfg)
    return model


def init_params(cfg, model, seed: int = 0):
    """Initialize backbone params with the config's shapes."""
    npoints = cfg.data.npoints
    extra = cfg.model.get("extra_feature_channels", 0)
    x = jnp.zeros((1, npoints, 3), jnp.float32)
    xc = jnp.zeros((1, npoints, extra), jnp.float32) if extra else None
    t = jnp.zeros((1,), jnp.float32)
    # jit: eager init dispatches hundreds of tiny executables on TPU
    init = jax.jit(lambda k: model.init({"params": k}, x, t, xc, True))
    params = init(jax.random.key(seed))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info("Generated model with following number of params (M): %.2f", n / 1e6)
    return params


def load_diffusion(cfg, seed: int = 0) -> Tuple[P2PBridge, Any, Optional[Dict]]:
    """Build bridge + params, restoring from cfg.model_path if set
    (model_loader.py:81-164).

    Returns (bridge, params_variables, checkpoint_dict_or_None)."""
    model = load_model(cfg)
    bridge = P2PBridge.from_config(cfg, model)
    params = init_params(cfg, model, seed=seed)
    ckpt = None
    model_path = cfg.get("model_path", None)
    if model_path:
        ckpt = restore_checkpoint(model_path, params_template=params)
        params = ckpt["params"]
    return bridge, params, ckpt


# ---------------------------------------------------------------- orbax io
def _ckpt_dir(output_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(output_dir), f"step_{step}")


def save_checkpoint(output_dir: str, step: int, params, ema_params=None,
                    opt_state=None) -> str:
    """Save {params, ema, opt_state, step} (train.py:167-175 analogue)."""
    path = _ckpt_dir(output_dir, step)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params, "step": jnp.asarray(step, jnp.int32)}
    if ema_params is not None:
        payload["ema"] = ema_params
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(output_dir: str) -> Optional[str]:
    if not os.path.isdir(output_dir):
        return None
    steps = []
    for d in os.listdir(output_dir):
        m = re.fullmatch(r"step_(\d+)", d)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None
    return _ckpt_dir(output_dir, max(steps))


def resolve_model_path(model_path: str) -> str:
    """Accept either a checkpoint dir (step_N) or a run dir containing
    them (the reference passes .pth files; we pass directories)."""
    base = os.path.abspath(model_path)
    if re.search(r"step_\d+/?$", base):
        return base
    latest = latest_checkpoint(base)
    if latest is None:
        raise FileNotFoundError(f"no checkpoint under {model_path}")
    return latest



def _raw_restore(path: str) -> Dict[str, Any]:
    """Template-free restore that works across device topologies: builds
    an abstract template from checkpoint metadata with a fully-replicated
    sharding on the current devices (orbax otherwise insists on the
    topology the checkpoint was saved from)."""
    from jax.sharding import SingleDeviceSharding

    ckptr = ocp.StandardCheckpointer()
    meta = ckptr.metadata(path)
    tree = meta.item_metadata if hasattr(meta, "item_metadata") else meta
    sh = SingleDeviceSharding(jax.devices()[0])
    template = jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sh), tree
    )
    return ckptr.restore(path, template)


def checkpoint_keys(model_path: str) -> list:
    path = resolve_model_path(model_path)
    meta = ocp.StandardCheckpointer().metadata(path)
    if hasattr(meta, "item_metadata") and meta.item_metadata:
        return list(meta.item_metadata.keys())
    if isinstance(meta, dict):
        return list(meta.keys())
    try:
        return list(meta.keys())
    except Exception:
        return []


def restore_checkpoint(
    model_path: str, params_template=None, opt_state_template=None
) -> Dict[str, Any]:
    """Restore a checkpoint dict.

    Orbax requires the restore template to cover the FULL on-disk
    structure. When templates for every present key are available
    (params/ema use ``params_template``, opt_state needs
    ``opt_state_template``) a typed restore is performed; otherwise we
    fall back to a raw template-free restore — fine for inference since
    flax params are plain nested dicts, but the raw opt_state (lists/
    dicts instead of optax NamedTuples) must not be fed to an optimizer.
    """
    path = resolve_model_path(model_path)
    ckptr = ocp.StandardCheckpointer()
    if params_template is None:
        return _raw_restore(path)
    keys = checkpoint_keys(model_path)
    if "opt_state" in keys and opt_state_template is None:
        return _raw_restore(path)
    template: Dict[str, Any] = {}
    for k in keys:
        if k in ("params", "ema"):
            template[k] = params_template
        elif k == "step":
            template[k] = jnp.zeros((), jnp.int32)
        elif k == "opt_state":
            template[k] = opt_state_template
        else:
            # unknown extra key: fall back to raw restore
            return _raw_restore(path)
    return ckptr.restore(path, template)


def load_matched_weights(params, loaded) -> Tuple[Any, int, int]:
    """Adaptive partial weight load (reference model_loader.py:182-219):
    copy every leaf whose path exists in both pytrees with matching
    shape; keep the fresh initialization elsewhere. Enables loading
    checkpoints across config changes.

    Returns (merged_params, n_loaded, n_skipped)."""
    flat_new = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_old = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    n_loaded = n_skipped = 0
    merged = {}
    for path, leaf in flat_new.items():
        old = flat_old.get(path)
        if old is not None and tuple(old.shape) == tuple(leaf.shape):
            merged[path] = jnp.asarray(old, leaf.dtype)
            n_loaded += 1
        else:
            merged[path] = leaf
            n_skipped += 1
            logger.warning(
                "Parameter %s %s; keeping fresh init.",
                jax.tree_util.keystr(path),
                "not found in checkpoint" if old is None else "shape mismatch",
            )
    treedef = jax.tree_util.tree_structure(params)
    ordered = [merged[p] for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(treedef, ordered), n_loaded, n_skipped


def load_opt_yaml(model_path: str) -> Config:
    """Find the opt.yaml co-saved next to checkpoints
    (evaluate_objects.py:38-43 convention)."""
    base = os.path.abspath(model_path)
    for cand in (base, os.path.dirname(base)):
        p = os.path.join(cand, "opt.yaml")
        if os.path.exists(p):
            return Config.load(p)
    raise FileNotFoundError(f"opt.yaml not found near {model_path}")
