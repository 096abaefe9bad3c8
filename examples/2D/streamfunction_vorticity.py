"""2D streamfunction-vorticity: diffusing Gaussian vortex, velocity
reconstruction from the streamfunction — reference
examples/2D/StreamfunctionVorticity/stream_vorticity_double_vortex.jl.

Run:  python examples/2D/streamfunction_vorticity.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import penguin_tpu as pt
from penguin_tpu.solvers.streamvort import StreamVorticity

n = 40
mesh = pt.Mesh((n, n), (1.0, 1.0), (0.0, 0.0))
cap = pt.compute_capacity(pt.geometry.full_domain(2), mesh, p=4, s=1)
ops = pt.make_diffusion_ops(cap)
C = np.asarray(cap.C_om)
# counter-rotating vortex pair
w0 = (np.exp(-((C[..., 0] - 0.35) ** 2 + (C[..., 1] - 0.5) ** 2) / 0.008)
      - np.exp(-((C[..., 0] - 0.65) ** 2 + (C[..., 1] - 0.5) ** 2) / 0.008))
w0[np.asarray(cap.V) == 0] = 0.0
z = jnp.zeros(mesh.np_shape)
bc0 = pt.Dirichlet(0.0)
bords = pt.BorderConditions({k: bc0 for k in ("left", "right", "top", "bottom")})
sv = StreamVorticity(cap, 0.02, 1e-3, ops,
                     bc_stream_border=bords, bc_vorticity_border=bords,
                     omega0=(jnp.asarray(w0), z))
e0 = float((jnp.asarray(w0) ** 2 * cap.V).sum())
sv.run(10)
w = np.asarray(sv.omega[0])
e1 = float((sv.omega[0] ** 2 * cap.V).sum())
uy = np.asarray(sv.velocity[1])
print(f"enstrophy decay: {e1/e0:.4f} (< 1, viscous)")
jet = uy[n // 2, n // 2]
print(f"centerline jet between the vortex pair: u_y = {jet:+.4f}")
assert 0 < e1 < e0 and np.isfinite(w).all()
assert abs(jet) > 1e-4  # the pair induces a jet between them
