"""2D streamfunction-vorticity: random zero-mean vorticity noise decaying
viscously in the full domain (2D 'decaying turbulence' of the psi-omega
formulation) — reference
examples/2D/StreamfunctionVorticity/stream_vorticity_uniform.jl.

Gates: zero-mean stays zero-mean (discrete circulation conservation up to
border rows), enstrophy decays monotonically, energy stays bounded.

Run:  python examples/2D/stream_vorticity_random.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.streamvort import StreamVorticity

n = 64
mesh = pt.Mesh((n, n), (1.0, 1.0), (0.0, 0.0))
cap = pt.compute_capacity(pt.geometry.full_domain(2), mesh, p=4, s=1)
ops = pt.make_diffusion_ops(cap)

rng = np.random.default_rng(2024)
w0 = rng.uniform(-1.0, 1.0, mesh.np_shape)
w0[np.asarray(cap.V) == 0] = 0.0
w0 -= w0[np.asarray(cap.V) > 0].mean()

z = jnp.zeros(mesh.np_shape)
bc0 = pt.Dirichlet(0.0)
bords = pt.BorderConditions({k: bc0 for k in
                             ("left", "right", "top", "bottom")})
sv = StreamVorticity(cap, 0.01, 5e-4, ops,
                     bc_stream_border=bords, bc_vorticity_border=bords,
                     omega0=(jnp.asarray(w0), z))

V = np.asarray(cap.V)
ens = [float((jnp.asarray(w0) ** 2 * cap.V).sum())]
for _ in range(4):
    sv.run(5)
    ens.append(float((sv.omega[0] ** 2 * cap.V).sum()))

print("enstrophy history:", " ".join(f"{e:.4e}" for e in ens))
assert all(ens[i + 1] < ens[i] for i in range(len(ens) - 1)), ens
w = np.asarray(sv.omega[0])
assert np.isfinite(w).all()
# noise decorrelates and smooths: the max amplitude must have dropped
assert np.abs(w[V > 0]).max() < 0.9 * np.abs(w0[V > 0]).max()
u = np.asarray(sv.velocity[0])
print(f"final enstrophy ratio {ens[-1]/ens[0]:.4f}, max|u| {np.abs(u).max():.4f}")
assert np.abs(u).max() < 1.0
print("OK")
