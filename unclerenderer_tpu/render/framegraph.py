"""Frame-graph introspection: named per-pass timing + culling stats.

The reference's render graph wraps every pass in GPU timestamp queries and
keeps rolling 1-second avg/min/max windows shown in the UI
(``RenderGraph.cpp:323-390, 698-771``).  Here the graph is the jit trace --
XLA fuses passes, so "per-pass" timing is a *debug mode* that executes the
major stages as separate blocking device calls (the analog of the reference's
GpuTiming toggle, which also adds overhead when on).
"""

from __future__ import annotations

import time
from collections import defaultdict, deque


class PassTimingStats:
    """Rolling-window (1 s) avg/min/max per named pass
    (mirrors FRenderGraph::GetGpuTimingStats)."""

    def __init__(self, window_seconds: float = 1.0):
        self.window = window_seconds
        self._samples: dict[str, deque] = defaultdict(deque)

    def add_sample(self, name: str, ms: float) -> None:
        now = time.monotonic()
        q = self._samples[name]
        q.append((now, ms))
        cutoff = now - self.window
        while q and q[0][0] < cutoff:
            q.popleft()

    def stats(self) -> list[dict]:
        """Sorted by average, descending (like the reference UI)."""
        out = []
        for name, q in self._samples.items():
            if not q:
                continue
            vals = [v for _, v in q]
            out.append(
                {
                    "name": name,
                    "avg_ms": sum(vals) / len(vals),
                    "min_ms": min(vals),
                    "max_ms": max(vals),
                    "samples": len(vals),
                }
            )
        out.sort(key=lambda s: -s["avg_ms"])
        return out

    def format_table(self, top_n: int = 16) -> str:
        lines = [f"{'pass':<24}{'avg ms':>9}{'min ms':>9}{'max ms':>9}{'n':>5}"]
        for s in self.stats()[:top_n]:
            lines.append(
                f"{s['name']:<24}{s['avg_ms']:>9.3f}{s['min_ms']:>9.3f}"
                f"{s['max_ms']:>9.3f}{s['samples']:>5}"
            )
        return "\n".join(lines)


def profile_deferred_passes(renderer, iterations: int = 3) -> PassTimingStats:
    """Execute the deferred pipeline stage-by-stage with device syncs to
    attribute wall time to named passes (debug mode; the fused frame is
    faster than the sum of these)."""
    import jax
    import jax.numpy as jnp

    from ..ops.cull import frustum_cull
    from ..ops.hzb import build_hzb, hzb_layout
    from ..ops.post import cas_sharpen, temporal_aa, tonemap
    from . import common
    from .deferred import frustum_planes

    scene = renderer.device_scene
    settings = renderer.settings
    stats = PassTimingStats(window_seconds=1e9)

    params = renderer.frame_params()
    layout, _ = hzb_layout(settings.width // 2, settings.height // 2)

    def timed(name, fn, *args):
        out = fn(*args)  # warm-up/compile
        jax.block_until_ready(out)
        for _ in range(iterations):
            t0 = time.monotonic()
            out = fn(*args)
            jax.block_until_ready(out)
            stats.add_sample(name, (time.monotonic() - t0) * 1e3)
        return out

    cull_fn = jax.jit(
        lambda bmin, bmax, vp: frustum_cull(bmin, bmax, frustum_planes(vp))
    )
    visible = timed(
        "GPU Culling", cull_fn, scene.bounds_min, scene.bounds_max,
        params.view @ params.proj_unjittered,
    )
    model_visible = params.model_visible & visible

    opaque_mask, masked_mask = common.tri_draw_masks(scene, model_visible)
    # NOTE: the scene is always an explicit jit argument -- closing over it
    # would bake the 100s-of-MB atlas into the compile payload.
    if settings.enable_shadows:
        shadow_fn = jax.jit(
            lambda sc, m: common.raster_shadow(sc, params.light_view_proj, m, settings)
        )
        timed("ShadowMap", shadow_fn, scene, opaque_mask | masked_mask)

    vert_fn = jax.jit(
        lambda sc, vp: common.vertex_stage(sc, vp, settings.width, settings.height)
    )
    clip, pix_h = timed("VertexStage", vert_fn, scene, params.view_proj)

    raster_fn = jax.jit(lambda sc, c, p, m: common.raster_opaque(sc, c, p, m, settings))
    raster_out = timed("GBuffer(Visibility)", raster_fn, scene, clip, pix_h, opaque_mask)
    depth, tri_id, cids = raster_out[0], raster_out[1], raster_out[4]

    if settings.enable_hzb:
        hzb_fn = jax.jit(lambda d: build_hzb(d, layout))
        timed("Build HZB", hzb_fn, depth)

    resolve_fn = jax.jit(
        lambda sc, p, t, ci: common.resolve_materials(sc, p, t, settings, compact_ids=ci)
    )
    g = timed("MaterialResolve", resolve_fn, scene, pix_h, tri_id, cids)

    from ..ops import pbr

    def lighting(g):
        view3 = params.view[:3, :3]
        n = pbr.normalize(g["normal"] @ view3)
        l = pbr.normalize(params.light_dir @ view3)
        v = pbr.normalize(params.camera_pos - g["world_pos"]) @ view3
        f0 = 0.04 + (g["albedo"] - 0.04) * g["metallic"][..., None]
        return pbr.evaluate_pbr(g["albedo"], g["metallic"], g["roughness"], f0, n, v, l)

    hdr = timed("Lighting", jax.jit(lighting), g)

    if settings.enable_taa:
        taa_fn = jax.jit(
            lambda x, h: temporal_aa(x, h, params.taa_history_weight, jnp.array(True))
        )
        hdr = timed("TemporalAA", taa_fn, hdr, renderer.frame_state.taa_history)
    tm_fn = jax.jit(
        lambda x: tonemap(x, params.tonemap_exposure, jnp.float32(0.0),
                          settings.enable_tonemap, False, params.tonemap_gamma)
    )
    color = timed("Tonemap", tm_fn, hdr)
    if settings.enable_cas:
        cas_fn = jax.jit(lambda x: cas_sharpen(x, params.cas_sharpness))
        timed("CAS", cas_fn, color)
    return stats


# Re-exported for backwards compatibility; lives in core so ops modules can
# import it without a render-layer (circular) dependency.
from ..core.passes import named_pass  # noqa: E402,F401
