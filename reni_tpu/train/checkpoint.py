"""Checkpoint save/restore with cross-task partial (decoder-only) loading.

The reference persists Lightning checkpoints carrying ``hyper_parameters.
config`` plus the state dict, and its custom ``load_state_dict`` strips
prefixes and restores *only the decoder* when ``fixed_decoder`` so a fresh
latent table of any size can be attached (reference: src/models/RENI.py:
190-203, 347-360; run.py:79-84, 112-113 for task chaining).

Here a checkpoint is a .npz of path-flattened pytree leaves plus a JSON
sidecar of metadata (config, task, epoch, metrics). Decoder-only restore is
a pytree filter: take the ``decoder`` subtree, re-init ``latents``.

No framework dependency (orbax would also work, but a flat .npz is
transparent, versionless and fast at this model size ~1 MB).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np

from reni_tpu.models.reni import RENIConfig, RENIModel

Params = dict[str, Any]

_SEP = "/"


def _flatten(tree, prefix="") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}{_SEP}"))
    elif tree is None:
        pass
    else:
        out[prefix[: -len(_SEP)]] = np.asarray(tree)
    return out


def _unflatten(flat: dict[str, np.ndarray]):
    root: dict = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def fetch_tree(tree):
    """Batched device->host fetch that also handles cross-process-sharded
    leaves (row-sharded latent tables / tensor-parallel decoder weights in
    a multi-host job): those must be allgathered, plain device_get raises
    on non-fully-addressable arrays.

    NB the allgather is a COLLECTIVE — in a multi-host job every process
    must call this at the same point (the trainer fetches symmetrically and
    gates only the file write to host 0); a lone caller hangs."""
    leaves = jax.tree_util.tree_leaves(tree)
    if jax.process_count() > 1 and any(
        isinstance(l, jax.Array) and not l.is_fully_addressable for l in leaves
    ):
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(tree, tiled=True)
    return jax.device_get(tree)


def save_checkpoint(
    path: str,
    params: Params,
    *,
    model_config: RENIConfig | None = None,
    metadata: dict | None = None,
    opt_state=None,
    rng_key=None,
) -> None:
    """Write ``path``.npz (leaves) and ``path``.json (config + metadata).

    With ``opt_state`` (and ``rng_key`` for variational models, whose latent
    sampling consumes the stream) the training state is stored too, enabling
    bitwise mid-task resume — a capability the reference only gets through
    Lightning's full-trainer checkpoints."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    # one batched device->host fetch per tree (per-leaf np.asarray would be
    # one transfer round trip per leaf — ~2 s per save on a tunneled chip)
    flat = _flatten(fetch_tree(params))
    if opt_state is not None:
        flat.update(_flatten(fetch_tree(opt_state), f"__opt__{_SEP}"))
    if rng_key is not None:
        if jax.dtypes.issubdtype(rng_key.dtype, jax.dtypes.prng_key):
            rng_key = jax.random.key_data(rng_key)
        flat["__rng__"] = np.asarray(rng_key)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)
    meta = dict(metadata or {})
    if model_config is not None:
        meta["model_config"] = dataclasses.asdict(model_config)
    with open(_json_path(path), "w") as f:
        json.dump(meta, f, indent=2, default=float)


def _json_path(path: str) -> str:
    base = path[: -len(".npz")] if path.endswith(".npz") else path
    return base + ".json"


def _npz_path(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def load_checkpoint(path: str) -> tuple[Params, dict]:
    """-> (params pytree, metadata dict with optional 'model_config')."""
    with np.load(_npz_path(path)) as npz:
        flat = {
            k: npz[k]
            for k in npz.files
            if not (k.startswith(f"__opt__{_SEP}") or k == "__rng__")
        }
    params = _unflatten(flat)
    meta = {}
    if os.path.exists(_json_path(path)):
        with open(_json_path(path)) as f:
            meta = json.load(f)
    return jax.tree.map(jax.numpy.asarray, params), meta


def load_rng_key(path: str):
    """Restore the training PRNG key (or None if absent)."""
    with np.load(_npz_path(path)) as npz:
        if "__rng__" not in npz.files:
            return None
        return jax.numpy.asarray(npz["__rng__"])


def load_opt_state(path: str, template):
    """Restore a saved optimizer state into ``template``'s exact pytree
    structure (optax states are NamedTuples, which the flat store cannot
    reconstruct by itself — leaves are matched in flattening order).
    Returns None if the checkpoint carries no optimizer state."""
    prefix = f"__opt__{_SEP}"
    with np.load(_npz_path(path)) as npz:
        flat = {
            k[len(prefix):]: npz[k] for k in npz.files if k.startswith(prefix)
        }
    if not flat:
        return None
    saved = _unflatten(flat)
    leaves = jax.tree.leaves(saved)
    structure = jax.tree.structure(template)
    if structure.num_leaves != len(leaves):
        raise ValueError(
            f"optimizer state mismatch: checkpoint has {len(leaves)} leaves, "
            f"current optimizer expects {structure.num_leaves}"
        )
    template_leaves = jax.tree.leaves(template)
    cast = [
        jax.numpy.asarray(l, dtype=t.dtype) for l, t in zip(leaves, template_leaves)
    ]
    return jax.tree.unflatten(structure, cast)


def load_model_config(path: str, **overrides) -> RENIConfig:
    """Rebuild the RENIConfig stored in a checkpoint (the reference's
    ``chkpt['hyper_parameters']['config']`` pattern, examples.ipynb cell 4)."""
    _, meta = _meta_only(path)
    cfg = dict(meta["model_config"])
    cfg.update(overrides)
    return RENIConfig(**cfg)


def _meta_only(path: str) -> tuple[None, dict]:
    with open(_json_path(path)) as f:
        return None, json.load(f)


def find_latest(path: str) -> str:
    """Resolve ``path`` to a concrete checkpoint for ``--resume``.

    A file path passes through. A directory (a run dir or its checkpoints/
    subdir) resolves to the newest checkpoint — preferring the ``*_latest``
    files the trainer overwrites every periodic save, so a crash loses at
    most EVERY_N_EPOCHS epochs even when best-K retention has deleted newer
    best-by-loss checkpoints (reference analog: Lightning's ``last.ckpt``
    saved independently of ``save_top_k``, run.py:79-84)."""
    if os.path.exists(_json_path(path)):
        return path
    cands = []
    for root in (path, os.path.join(path, "checkpoints")):
        if os.path.isdir(root):
            cands += [
                os.path.join(root, f[: -len(".json")])
                for f in os.listdir(root)
                if f.endswith(".json")
                and os.path.exists(_npz_path(os.path.join(root, f[: -len(".json")])))
            ]
    if not cands:
        raise FileNotFoundError(f"no checkpoints found under {path!r}")
    latest = [c for c in cands if c.endswith("_latest")]
    pool = latest or cands
    return max(pool, key=lambda c: os.path.getmtime(_json_path(c)))


def load_decoder_only(
    path: str, model: RENIModel, dataset_size: int, key
) -> Params:
    """Decoder weights from the checkpoint + a fresh latent table sized for
    the new dataset — the reference's fixed_decoder partial restore."""
    saved, _ = load_checkpoint(path)
    return {
        "decoder": saved["decoder"],
        "latents": model.init_latents(key, dataset_size),
    }
