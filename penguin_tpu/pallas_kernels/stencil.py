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


def _kernel3(cc_ref, cxm_ref, cxp_ref, cym_ref, cyp_ref, czm_ref, czp_ref,
             x_hbm, y_ref, xtile, xum, xdp, yum, ydp, sems,
             *, tile_x, tile_y, x_total, y_total):
    i = pl.program_id(0)
    j = pl.program_id(1)
    p0 = i * tile_x
    q0 = pl.multiple_of(j * tile_y, 8)

    cp0 = pltpu.make_async_copy(
        x_hbm.at[pl.ds(p0, tile_x), pl.ds(q0, tile_y)], xtile, sems.at[0]
    )
    cp0.start()
    # x-halos: axis 0 is untiled (neither sublane nor lane), so
    # single-plane slices need no alignment games — boundary tiles read a
    # clamped neighbour plane, zeroed by the gl masks below.
    cp1 = pltpu.make_async_copy(
        x_hbm.at[pl.ds(jnp.maximum(p0 - 1, 0), 1), pl.ds(q0, tile_y)],
        xum, sems.at[1]
    )
    cp1.start()
    cp2 = pltpu.make_async_copy(
        x_hbm.at[pl.ds(jnp.minimum(p0 + tile_x, x_total - 1), 1),
                 pl.ds(q0, tile_y)],
        xdp, sems.at[2]
    )
    cp2.start()
    # y-halos: axis 1 is the sublane dim, so 8-row aligned stripes (the
    # 2D kernel's trick) — the needed neighbour row sits at static local
    # index 7 (up) / 0 (down); boundary garbage is masked via gy below.
    cp3 = pltpu.make_async_copy(
        x_hbm.at[pl.ds(p0, tile_x),
                 pl.ds(pl.multiple_of(jnp.maximum(q0 - 8, 0), 8), 8)],
        yum, sems.at[3]
    )
    cp3.start()
    cp4 = pltpu.make_async_copy(
        x_hbm.at[pl.ds(p0, tile_x),
                 pl.ds(pl.multiple_of(
                     jnp.minimum(q0 + tile_y, y_total - 8), 8), 8)],
        ydp, sems.at[4]
    )
    cp4.start()
    cp0.wait()
    cp1.wait()
    cp2.wait()
    cp3.wait()
    cp4.wait()

    xc = xtile[...]
    tx, ty, nz = xc.shape
    ids_x = jax.lax.broadcasted_iota(jnp.int32, xc.shape, 0)
    ids_y = jax.lax.broadcasted_iota(jnp.int32, xc.shape, 1)
    ids_z = jax.lax.broadcasted_iota(jnp.int32, xc.shape, 2)
    gx = ids_x + p0
    gy = ids_y + q0

    xm = pltpu.roll(xc, 1, 0)
    xm = jnp.where(ids_x == 0, xum[...], xm)
    xm = jnp.where(gx >= 1, xm, 0.0)
    xp = pltpu.roll(xc, tx - 1, 0)
    xp = jnp.where(ids_x == tx - 1, xdp[...], xp)
    xp = jnp.where(gx <= x_total - 2, xp, 0.0)

    iota8 = jax.lax.broadcasted_iota(jnp.int32, (tx, 8, nz), 1)
    yum_vec = jnp.sum(jnp.where(iota8 == 7, yum[...], 0.0), axis=1,
                      keepdims=True)
    ydp_vec = jnp.sum(jnp.where(iota8 == 0, ydp[...], 0.0), axis=1,
                      keepdims=True)
    ym = pltpu.roll(xc, 1, 1)
    ym = jnp.where(ids_y == 0, yum_vec, ym)
    ym = jnp.where(gy >= 1, ym, 0.0)
    yp = pltpu.roll(xc, ty - 1, 1)
    yp = jnp.where(ids_y == ty - 1, ydp_vec, yp)
    yp = jnp.where(gy <= y_total - 2, yp, 0.0)

    zm = pltpu.roll(xc, 1, 2)
    zm = jnp.where(ids_z >= 1, zm, 0.0)
    zp = pltpu.roll(xc, nz - 1, 2)
    zp = jnp.where(ids_z <= nz - 2, zp, 0.0)

    y_ref[...] = (
        cc_ref[...] * xc
        + cxm_ref[...] * xm + cxp_ref[...] * xp
        + cym_ref[...] * ym + cyp_ref[...] * yp
        + czm_ref[...] * zm + czp_ref[...] * zp
    )


@functools.partial(jax.jit, static_argnames=("tile_x", "tile_y"))
def stencil7_matvec(cc, cxm, cxp, cym, cyp, czm, czp, x, tile_x=8,
                    tile_y=None):
    """Fused 7-point variable-coefficient stencil apply (TPU Pallas, 3D).

        y[i,j,k] = cc x[i,j,k] + cxm x[i-1,j,k] + cxp x[i+1,j,k]
                 + cym x[i,j-1,k] + cyp x[i,j+1,k]
                 + czm x[i,j,k-1] + czp x[i,j,k+1]

    Same design as the 2D kernel: a (x-planes × y-stripes) grid;
    coefficients stream through VMEM (tiling BOTH x and y keeps the
    working set under the ~16 MB scoped-VMEM limit at 256³+), ``x`` stays
    in HBM and each program DMAs its tile plus two single-plane x-halos
    and two 8-row-aligned y-halo stripes.  (NY, NZ) map to
    (sublane, lane): NY % tile_y == 0 (tile_y % 8 == 0), NZ % 128 == 0,
    NX % tile_x == 0.
    """
    NX, NY, NZ = x.shape
    if tile_y is None:
        tile_y = min(64, NY)
    if NX % tile_x or NY % tile_y or tile_y % 8 or NZ % 128:
        raise ValueError(
            f"stencil7_matvec needs NX % {tile_x} == 0, NY % {tile_y} == 0 "
            f"(tile_y % 8 == 0) and NZ % 128 == 0; got {x.shape} — pad the "
            f"arrays once at setup"
        )
    grid = (NX // tile_x, NY // tile_y)
    spec = pl.BlockSpec((tile_x, tile_y, NZ), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel3, tile_x=tile_x, tile_y=tile_y,
                               x_total=NX, y_total=NY)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec] * 7 + [pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NX, NY, NZ), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_x, tile_y, NZ), x.dtype),
            pltpu.VMEM((1, tile_y, NZ), x.dtype),
            pltpu.VMEM((1, tile_y, NZ), x.dtype),
            pltpu.VMEM((tile_x, 8, NZ), x.dtype),
            pltpu.VMEM((tile_x, 8, NZ), x.dtype),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )(cc, cxm, cxp, cym, cyp, czm, czp, x)


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
