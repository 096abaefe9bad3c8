"""1D front tracking: sorted marker positions partitioning the line into
fluid/solid intervals (re-design of
``/root/reference/src/front_tracking1D.jl``): parity-based inside test,
SDF, and 1D capacities, all vectorized."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["FrontTracker1D", "sdf_1d", "inside_1d"]


def inside_1d(markers, x, first_inside=True):
    """Parity inside-test: regions alternate starting with ``first_inside``
    left of the first marker (front_tracking1D.jl:57-67)."""
    markers = jnp.sort(jnp.asarray(markers))
    count = jnp.sum(x[..., None] >= markers, axis=-1)
    odd = count % 2 == 1
    return odd if not first_inside else ~odd


def sdf_1d(markers, x, first_inside=True):
    """Signed distance: negative inside the fluid."""
    markers = jnp.sort(jnp.asarray(markers))
    d = jnp.min(jnp.abs(x[..., None] - markers), axis=-1)
    return jnp.where(inside_1d(markers, x, first_inside), -d, d)


class FrontTracker1D:
    def __init__(self, markers=None, first_inside=True):
        self.markers = None if markers is None else jnp.sort(jnp.asarray(markers))
        self.first_inside = first_inside

    def set_markers(self, markers):
        self.markers = jnp.sort(jnp.asarray(markers))
        return self

    def sdf(self, x):
        return sdf_1d(self.markers, jnp.asarray(x), self.first_inside)

    def inside(self, x):
        return inside_1d(self.markers, jnp.asarray(x), self.first_inside)

    def body(self):
        m = self.markers
        fi = self.first_inside

        def b(x):
            return sdf_1d(m, x, fi)

        return b

    def fluid_length(self, domain):
        """Total fluid measure inside [a, b]."""
        a, b = domain
        pts = np.concatenate([[a], np.asarray(self.markers), [b]])
        pts = np.clip(pts, a, b)
        lengths = np.diff(pts)
        inside0 = self.first_inside
        seg_inside = [inside0 ^ (i % 2 == 1) for i in range(len(lengths))]
        return float(sum(l for l, s in zip(lengths, seg_inside) if s))
