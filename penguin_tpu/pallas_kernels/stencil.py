"""Pallas TPU kernel for the variable-coefficient 5-point stencil — the
matvec inside the cut-cell heat CG solve (see solvers/heat_fast.py, which
collapses ``V + dt·Id·GᵀWꜝG`` to this form).

    y[i,j] = cc[i,j] x[i,j] + cxm[i,j] x[i-1,j] + cxp[i,j] x[i+1,j]
           + cym[i,j] x[i,j-1] + cyp[i,j] x[i,j+1]

Design (see the TPU kernel playbook): the grid tiles rows; coefficient
tiles stream through VMEM via BlockSpec pipelining, while ``x`` stays in
HBM — each program DMAs its aligned row-tile plus two single-row halos into
VMEM scratch.  Row/column neighbours are lane/sublane rolls with edge
masking, so the whole apply is one fused VPU pass: 6 arrays in, 1 out —
the HBM roofline for this operator.

Shapes must be tile-aligned (M % tile_m == 0, N % 128 == 0); callers pad
once at setup (see FastHeatBE) — Mosaic requires statically provable
sublane alignment for vector slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas requires a TPU-capable lowering; import is gated
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def stencil5_available():
    return _HAS_PALLAS and jax.default_backend() == "tpu"


def _kernel(cc_ref, cxm_ref, cxp_ref, cym_ref, cyp_ref, x_hbm, y_ref,
            xtile, xup_row, xdn_row, sems, *, tile_m, m_total):
    i = pl.program_id(0)
    row0 = pl.multiple_of(i * tile_m, 8)

    cp0 = pltpu.make_async_copy(
        x_hbm.at[pl.ds(row0, tile_m)], xtile, sems.at[0]
    )
    cp0.start()
    # 8-row aligned halo blocks (sublane tiling requires multiples of 8);
    # the needed neighbour row sits at a *static* local index: 7 in the up
    # block, 0 in the down block — boundary tiles read garbage there, which
    # the gl_row masks below zero out.
    up_src = pl.multiple_of(jnp.maximum(row0 - 8, 0), 8)
    cp1 = pltpu.make_async_copy(
        x_hbm.at[pl.ds(up_src, 8)], xup_row, sems.at[1]
    )
    cp1.start()
    dn_src = pl.multiple_of(jnp.minimum(row0 + tile_m, m_total - 8), 8)
    cp2 = pltpu.make_async_copy(
        x_hbm.at[pl.ds(dn_src, 8)], xdn_row, sems.at[2]
    )
    cp2.start()
    cp0.wait()
    cp1.wait()
    cp2.wait()

    xc = xtile[...]
    n = xc.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_m, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_m, n), 1)
    gl_row = row_ids + row0

    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, n), 0)
    up_vec = jnp.sum(jnp.where(iota8 == 7, xup_row[...], 0.0), axis=0,
                     keepdims=True)
    dn_vec = jnp.sum(jnp.where(iota8 == 0, xdn_row[...], 0.0), axis=0,
                     keepdims=True)

    xup = pltpu.roll(xc, 1, 0)
    xup = jnp.where(row_ids == 0, up_vec, xup)
    xup = jnp.where(gl_row >= 1, xup, 0.0)

    xdn = pltpu.roll(xc, tile_m - 1, 0)
    xdn = jnp.where(row_ids == tile_m - 1, dn_vec, xdn)
    xdn = jnp.where(gl_row <= m_total - 2, xdn, 0.0)

    xl = pltpu.roll(xc, 1, 1)
    xl = jnp.where(col_ids >= 1, xl, 0.0)
    xr = pltpu.roll(xc, n - 1, 1)
    xr = jnp.where(col_ids <= n - 2, xr, 0.0)

    y_ref[...] = (
        cc_ref[...] * xc
        + cxm_ref[...] * xup
        + cxp_ref[...] * xdn
        + cym_ref[...] * xl
        + cyp_ref[...] * xr
    )


@functools.partial(jax.jit, static_argnames=("tile_m",))
def stencil5_matvec(cc, cxm, cxp, cym, cyp, x, tile_m=128):
    """Fused 5-point variable-coefficient stencil apply (TPU Pallas)."""
    M, N = x.shape
    if M % tile_m or N % 128:
        raise ValueError(
            f"stencil5_matvec needs M % {tile_m} == 0 and N % 128 == 0; "
            f"got {x.shape} — pad the arrays once at setup"
        )
    grid = M // tile_m
    spec = pl.BlockSpec((tile_m, N), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, tile_m=tile_m, m_total=M)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[spec, spec, spec, spec, spec,
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_m, N), x.dtype),
            pltpu.VMEM((8, N), x.dtype),
            pltpu.VMEM((8, N), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(cc, cxm, cxp, cym, cyp, x)
