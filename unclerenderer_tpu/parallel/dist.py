"""Collective hooks: ONE deferred frame body runs single-chip or sharded.

The reference is strictly single-GPU (SURVEY.md section 2.7).  The TPU-native
scale-out axis is tile-space data parallelism: each device owns a horizontal
slab of the viewport.  Everything slab-dependent in the frame is expressed
through this small interface, so ``render/deferred.py`` contains the ONLY
lighting/post implementation:

* ``SingleChip``: identity collectives (the default; zero overhead -- the
  hooks reduce to the plain single-device ops).
* ``RowShards``: ICI collectives inside ``shard_map`` over a 1D mesh --
  ``all_gather`` for the shadow map and the HZB source depth, ``psum`` for
  the auto-exposure luminance grid and stats counters, ``ppermute`` halo
  exchange for the TAA/CAS 3x3 neighborhoods at slab seams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class SingleChip:
    """Trivial hooks: the full frame is one slab."""

    n_dev = 1

    def __init__(self, height: int):
        self.slab_h = height
        self.row0 = 0  # python int: shifts fold away statically

    def all_gather_rows(self, x):
        return x

    def psum(self, x):
        return x

    def halo2d(self, img):
        """(H, W, C) -> (H+2, W+2, C) edge-padded 1-px border (what the
        single-chip TAA/CAS neighborhoods use at the frame edge)."""
        return jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")

    def row_below(self, img):
        """(H, W, ...) -> (1, W, ...): the row just below this slab
        (edge-replicated at the frame bottom) -- the forward-difference
        neighbor for the texture-LOD screen derivatives."""
        return img[-1:]

    def row_above(self, img):
        """Like row_below: the row just above (edge-replicated at the top)."""
        return img[:1]


class RowShards:
    """Hooks for a 1D ``("sp",)`` mesh inside shard_map; each device owns
    ``height // n_dev`` viewport rows (and ``shadow_size // n_dev`` shadow
    rows during the shadow raster)."""

    def __init__(self, axis: str, n_dev: int, height: int):
        assert height % n_dev == 0, "height must divide across the mesh"
        self.axis = axis
        self.n_dev = n_dev
        self.slab_h = height // n_dev

    @property
    def row0(self):
        return jax.lax.axis_index(self.axis) * self.slab_h

    def all_gather_rows(self, x):
        g = jax.lax.all_gather(x, self.axis)  # (n_dev, rows, ...)
        return g.reshape((g.shape[0] * g.shape[1],) + g.shape[2:])

    def psum(self, x):
        return jax.lax.psum(x, self.axis)

    def halo2d(self, img):
        """(Hs, W, C) -> (Hs+2, W+2, C): row halos ppermuted from the slab
        neighbors over ICI (edge rows at the frame boundary), columns
        edge-padded like the single-chip path."""
        n = self.n_dev
        idx = jax.lax.axis_index(self.axis)
        # row from the device above (its last row) and below (its first)
        from_above = jax.lax.ppermute(
            img[-1:], self.axis, [(i, i + 1) for i in range(n - 1)]
        )
        from_below = jax.lax.ppermute(
            img[:1], self.axis, [(i + 1, i) for i in range(n - 1)]
        )
        top = jnp.where(idx == 0, img[:1], from_above)
        bot = jnp.where(idx == n - 1, img[-1:], from_below)
        out = jnp.concatenate([top, img, bot], axis=0)
        return jnp.pad(out, ((0, 0), (1, 1), (0, 0)), mode="edge")

    def row_below(self, img):
        n = self.n_dev
        idx = jax.lax.axis_index(self.axis)
        from_below = jax.lax.ppermute(
            img[:1], self.axis, [(i + 1, i) for i in range(n - 1)]
        )
        return jnp.where(idx == n - 1, img[-1:], from_below)

    def row_above(self, img):
        n = self.n_dev
        idx = jax.lax.axis_index(self.axis)
        from_above = jax.lax.ppermute(
            img[-1:], self.axis, [(i, i + 1) for i in range(n - 1)]
        )
        return jnp.where(idx == 0, img[:1], from_above)
