"""penguin_tpu — a TPU-native cut-cell finite-volume framework.

From-scratch JAX/XLA/Pallas re-design of the capabilities of the Julia
reference Penguin.jl (see SURVEY.md): level-set capacity construction,
matrix-free cut-cell operators, scalar diffusion / advection-diffusion /
Darcy solvers, diphasic interface-jump systems, moving interfaces (prescribed
and Stefan front-tracking), and Stokes/Navier-Stokes saddle-point solvers —
all jit-compiled, with Krylov solves replacing sparse direct factorization.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: compiles in this environment go through a
# remote service (~40 s/graph), so caching across processes is essential.
# The cache is partitioned per host CPU: XLA:CPU AOT executables baked for
# one machine's feature set can SIGILL on another (observed as pytest
# segfaults after a host swap — the loader only warns on feature mismatch).


def _host_cache_tag():
    import hashlib as _hashlib
    import platform as _platform

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(
                (ln for ln in f if ln.startswith(("flags", "Features"))), "")
    except OSError:  # pragma: no cover
        flags = _platform.processor()
    h = _hashlib.sha1(flags.encode()).hexdigest()[:10]
    return f"{_platform.machine()}-{h}"


_cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
if _cache_dir is None:
    _cache_dir = _os.path.join("/root/.jax_cache", _host_cache_tag())
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:  # pragma: no cover - cache is an optimization only
    pass

from .mesh import Mesh, SpaceTimeMesh
from . import geometry
from .capacity import Capacity, compute_capacity
from .operators import (
    DiffusionOps,
    ConvectionOps,
    make_diffusion_ops,
    make_convection_ops,
)
from .boundary import (
    Dirichlet,
    Neumann,
    Robin,
    Periodic,
    Symmetry,
    Outflow,
    GibbsThomson,
    ScalarJump,
    FluxJump,
    BorderConditions,
    InterfaceConditions,
)
from .phase import Phase, Fluid
from .checkpoint import (checkpoint_solver, load_checkpoint, restore_solver,
                         save_checkpoint)
from .convergence import check_convergence, check_convergence_diph, lp_norm
from .utils import clamp_merge_small_cells

__all__ = [
    "clamp_merge_small_cells",
    "Mesh",
    "SpaceTimeMesh",
    "geometry",
    "Capacity",
    "compute_capacity",
    "DiffusionOps",
    "ConvectionOps",
    "make_diffusion_ops",
    "make_convection_ops",
    "Dirichlet",
    "Neumann",
    "Robin",
    "Periodic",
    "Symmetry",
    "Outflow",
    "GibbsThomson",
    "ScalarJump",
    "FluxJump",
    "BorderConditions",
    "InterfaceConditions",
    "Phase",
    "Fluid",
    "save_checkpoint",
    "load_checkpoint",
    "checkpoint_solver",
    "restore_solver",
    "check_convergence",
    "check_convergence_diph",
    "lp_norm",
]
