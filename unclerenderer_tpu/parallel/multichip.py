"""Multi-chip rendering: the pixel grid sharded over a device mesh.

The reference is strictly single-GPU (``SURVEY.md`` section 2.7); this is the
TPU-native scale-out axis: **tile-space data parallelism** over ICI.

The frame itself is ``render.deferred.deferred_frame`` -- the SAME body as
single-chip (one lighting implementation, full feature set: IBL, alpha-masked
geometry, HZB occlusion, the Pallas binned raster backend) -- run inside
``shard_map`` over a 1D ``("sp",)`` mesh with ``parallel.dist.RowShards``
collective hooks:

* geometry, material tables and atlases are replicated; each device owns a
  horizontal slab of the viewport (H/n rows), rasterized in slab-local
  coordinates by folding the row offset into the edge-function constants;
* the shadow map is row-sharded for rasterization, then ``all_gather``-ed
  (every receiver samples the full map) -- the collective rides ICI;
* the HZB builds replicated from the all_gather'd depth slabs, so next
  frame's occlusion culling sees the full screen;
* auto-exposure psums per-slab partial sums of the global 16x16 luminance
  grid (exact for any slab alignment);
* TAA and CAS exchange 1-row halos by ``ppermute`` so slab seams see their
  true neighbors;
* TAA history stays sharded with the slab; the framebuffer comes back
  sharded and XLA assembles it on demand.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

# replication checking was renamed check_rep -> check_vma across jax versions
import inspect as _inspect

_SHMAP_KW = {}
for _name in ("check_rep", "check_vma"):
    if _name in _inspect.signature(shard_map).parameters:
        _SHMAP_KW = {_name: False}
        break

from ..render.deferred import deferred_frame
from ..render.params import DeviceScene, FrameParams, FrameState, RenderSettings
from .dist import RowShards

AXIS = "sp"


def make_render_mesh(devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=(AXIS,))


def render_frame_multichip(
    scene: DeviceScene,
    params: FrameParams,
    state: FrameState,
    settings: RenderSettings,
    mesh: Mesh,
    shadow_map: jnp.ndarray | None = None,
):
    """Deferred-path frame over a device mesh.  Returns (out, new_state) with
    image outputs sharded by rows over the mesh; scalar outputs and the HZB
    are replicated."""
    n_dev = mesh.shape[AXIS]
    dist = RowShards(AXIS, n_dev, settings.height)

    def device_fn(taa_history):
        st = FrameState(
            taa_history=taa_history,
            taa_valid=state.taa_valid,
            exposure_ev=state.exposure_ev,
            exposure_valid=state.exposure_valid,
            hzb=state.hzb,
            hzb_valid=state.hzb_valid,
            frame_index=state.frame_index,
        )
        return deferred_frame(scene, params, st, settings, shadow_map, dist)

    rep = P()
    slab = P(AXIS)
    out_spec = {
        "color": slab,
        "hdr": slab,
        "depth": slab,
        "tri_id": slab,
        "object_id": slab,
        "model_visible": rep,
        "raster_stats": {
            "pair_overflow": rep,
            "giant_truncated": rep,
            "compact_overflow": rep,
            # light-space compaction runs identically on every device
            # (raster_shadow shards rows only after setup), so the count
            # is replicated, not psummed (render/deferred.py)
            "shadow_compact_overflow": rep,
            # anisotropic filtering adds its per-slab tap-overflow count
            # (already psummed inside deferred_frame -> replicated here)
            **({"aniso_tap_overflow": rep}
               if settings.texture_filter == "anisotropic" else {}),
        },
        "frustum_culled": rep,
        "hzb_occluded": rep,
    }
    from ..render.common import compaction_cap

    if compaction_cap(settings, scene.tri_geo.shape[0]):
        # compaction runs replicated (identical setup math on every device),
        # so the compact->global id map is itself replicated
        out_spec["tri_remap"] = rep
    state_spec = FrameState(
        taa_history=slab,
        taa_valid=rep,
        exposure_ev=rep,
        exposure_valid=rep,
        hzb=rep,
        hzb_valid=rep,
        frame_index=rep,
    )
    sharded = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(slab,),
        out_specs=(out_spec, state_spec),
        **_SHMAP_KW,
    )
    return sharded(state.taa_history)
