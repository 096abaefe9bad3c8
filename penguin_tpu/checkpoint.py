"""Checkpoint / resume for long simulations.

The reference keeps full state history in memory and exports post-hoc
(``push!(s.states, s.x)``, diffusion.jl:277,296 + vtk.jl) — it has no
checkpointing (SURVEY §5).  Here simulation state is a pytree of device
arrays, so a checkpoint is just that pytree plus a small metadata dict:

- ``save_checkpoint(path, state, meta=...)`` — flattens any pytree of
  arrays/scalars into one compressed ``.npz`` plus a JSON-encoded treedef
  and metadata (time, dt, step, front markers, anything picklable as JSON).
- ``load_checkpoint(path)`` — returns ``(state, meta)`` with the original
  tree structure and jnp arrays (restored onto the default device).
- ``checkpoint_solver`` / ``restore_solver`` — convenience wrappers that
  snapshot a solver's public state (``x``, plus moving-solver attributes
  ``markers``/``xf``/``marker_log``/``xf_log`` when present).

Orbax is available in the environment for sharded multi-host runs; this
module intentionally stays dependency-free (single .npz file) since all
reference-scale states are single-host.  For sharded arrays, pass the
addressable shards through ``jax.device_get`` first (done automatically).
"""

from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "checkpoint_solver",
    "restore_solver",
]

_SOLVER_ATTRS = ("x", "markers", "xf", "marker_log", "xf_log",
                 "residual_log", "iters_log", "newton_errs", "newton_iters")


def save_checkpoint(path, state, meta=None):
    """Write ``state`` (any pytree of arrays/scalars) + ``meta`` (JSON-able
    dict) to ``path`` (an ``.npz`` file)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(a))
              for i, a in enumerate(leaves)}
    header = {
        "treedef": str(treedef),
        "n_leaves": len(leaves),
        "meta": meta or {},
        "dtypes": [str(np.asarray(jax.device_get(a)).dtype) for a in leaves],
    }
    arrays["__header__"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8
    )
    # structure token: re-flattening at load time needs the example pytree,
    # so we also store a nested-list skeleton (tuples/lists/dicts of ints)
    skeleton = jax.tree_util.tree_unflatten(
        treedef, list(range(len(leaves)))
    )
    arrays["__skeleton__"] = np.frombuffer(
        json.dumps(_encode_skeleton(skeleton)).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)
    return path


def _encode_skeleton(obj):
    if isinstance(obj, tuple):
        return {"__t__": [_encode_skeleton(o) for o in obj]}
    if isinstance(obj, list):
        return {"__l__": [_encode_skeleton(o) for o in obj]}
    if isinstance(obj, dict):
        return {"__d__": {k: _encode_skeleton(v) for k, v in obj.items()}}
    if isinstance(obj, int):
        return obj
    raise TypeError(
        "save_checkpoint supports states built from tuples/lists/dicts of "
        f"arrays; got an unsupported pytree node of type {type(obj).__name__}"
        " — convert custom nodes (dataclasses, namedtuples) to plain "
        "containers first, e.g. via jax.tree_util.tree_flatten."
    )


def _decode_skeleton(obj, leaves):
    if isinstance(obj, dict):
        if "__t__" in obj:
            return tuple(_decode_skeleton(o, leaves) for o in obj["__t__"])
        if "__l__" in obj:
            return [_decode_skeleton(o, leaves) for o in obj["__l__"]]
        if "__d__" in obj:
            return {k: _decode_skeleton(v, leaves)
                    for k, v in obj["__d__"].items()}
    return leaves[int(obj)]


def load_checkpoint(path):
    """Returns ``(state, meta)``: the pytree with jnp arrays + metadata."""
    with np.load(path) as z:
        header = json.loads(bytes(z["__header__"]).decode())
        skeleton = json.loads(bytes(z["__skeleton__"]).decode())
        leaves = [jnp.asarray(z[f"leaf_{i}"])
                  for i in range(header["n_leaves"])]
    return _decode_skeleton(skeleton, leaves), header["meta"]


def checkpoint_solver(path, solver, t=None, dt=None, extra=None):
    """Snapshot the solver's resumable state (solution pytree + any
    moving-interface attributes present) + time metadata."""
    state = {}
    for attr in _SOLVER_ATTRS:
        val = getattr(solver, attr, None)
        if val is None:
            continue
        if isinstance(val, (int, float)):
            val = jnp.asarray(val)
        elif isinstance(val, np.ndarray):
            val = jnp.asarray(val)
        state[attr] = val
    meta = {"t": t, "dt": dt if dt is not None else getattr(solver, "dt", None),
            "solver": type(solver).__name__}
    if extra:
        meta.update(extra)
    return save_checkpoint(path, state, meta)


def restore_solver(path, solver):
    """Load a checkpoint into ``solver`` (sets the snapshotted attributes
    in place) and return the metadata dict."""
    state, meta = load_checkpoint(path)
    for attr, val in state.items():
        if attr in ("xf",):
            val = float(val)
        setattr(solver, attr, val)
    return meta
