"""Steady diffusion convergence tests against analytic solutions.

Mirrors the reference CI gates (test/convergence_test.jl:7-70): weighted L2
error < 1e-2 at n=40 for 1D/2D/3D Poisson in an embedded circle/sphere.
"""

import numpy as np
import pytest

import penguin_tpu as pt
from penguin_tpu.solvers import DiffusionSteadyMono


def test_steady_1d():
    nx, lx = 40, 4.0
    mesh = pt.Mesh((nx,), (lx,), (0.0,))
    center, radius = 0.5, 0.1
    body = pt.geometry.interval(center, radius)
    cap = pt.compute_capacity(body, mesh)
    ops = pt.make_diffusion_ops(cap)
    bc = pt.Dirichlet(0.0)
    bc_b = pt.BorderConditions({"top": pt.Dirichlet(0.0), "bottom": pt.Dirichlet(0.0)})
    phase = pt.Phase(cap, ops, lambda x, y, z: x, 1.0)
    solver = DiffusionSteadyMono(phase, bc_b, bc)
    solver.solve(method="direct")

    def u_ana(x):
        return (
            -((x - center) ** 3) / 6.0
            - center * (x - center) ** 2 / 2.0
            + radius**2 / 6.0 * (x - center)
            + center * radius**2 / 2.0
        )

    _, _, glob, full, cut, _ = pt.check_convergence(u_ana, solver, cap, 2, False)
    assert glob < 1e-2


def test_steady_2d():
    nx = ny = 40
    mesh = pt.Mesh((nx, ny), (4.0, 4.0), (0.0, 0.0))
    body = pt.geometry.circle((2.0, 2.0), 1.0)
    cap = pt.compute_capacity(body, mesh)
    ops = pt.make_diffusion_ops(cap)
    bc = pt.Dirichlet(0.0)
    bc1 = pt.Dirichlet(1.0)
    bc_b = pt.BorderConditions(
        {"left": bc1, "right": bc1, "top": bc1, "bottom": bc1}
    )
    phase = pt.Phase(cap, ops, lambda x, y, z: 4.0, 1.0)
    solver = DiffusionSteadyMono(phase, bc_b, bc)
    solver.solve(method="direct")

    def u_ana(x, y):
        return 1.0 - (x - 2.0) ** 2 - (y - 2.0) ** 2

    _, _, glob, full, cut, _ = pt.check_convergence(u_ana, solver, cap, 2, False)
    assert glob < 1e-2
