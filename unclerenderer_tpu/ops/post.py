"""Post-processing stack: TAA, auto-exposure, PBR-neutral tonemap, CAS.

Exact ports of ``TemporalAA.hlsl``, ``AutoExposure.hlsl``, ``Tonemap.hlsl``
and ``Cas.hlsl`` as fused per-pixel jnp passes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.passes import named_pass

# host-side constant: a module-level jnp.array would initialize the JAX
# backend at import time (and block forever when the TPU relay is down)
LUM_WEIGHTS = np.array([0.2126, 0.7152, 0.0722], np.float32)


@named_pass("TemporalAA")
def temporal_aa(
    current: jnp.ndarray,
    history: jnp.ndarray,
    history_weight,
    use_history,
    pad_fn=None,
) -> jnp.ndarray:
    """``TemporalAA.hlsl`` CSMain: 3x3 neighborhood min/max clamp of history,
    lerp(current, clamped_history, weight).  current/history: (H, W, 3).

    pad_fn(img) -> (H+2, W+2, 3) supplies the 1-px neighborhood border; the
    default is edge padding (frame boundary).  Sharded callers pass a halo
    exchange so slab seams see their true neighbors (parallel/dist.py)."""
    if pad_fn is None:
        pad = jnp.pad(current, ((1, 1), (1, 1), (0, 0)), mode="edge")
    else:
        pad = pad_fn(current)
    mn = current
    mx = current
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n = pad[1 + dy : 1 + dy + current.shape[0], 1 + dx : 1 + dx + current.shape[1]]
            mn = jnp.minimum(mn, n)
            mx = jnp.maximum(mx, n)
    clamped = jnp.clip(history, mn, mx)
    w = jnp.clip(history_weight, 0.0, 1.0)
    blended = current + (clamped - current) * w
    return jnp.where(use_history, blended, current)


@named_pass("AutoExposure")
def auto_exposure_ev(
    hdr: jnp.ndarray,
    prev_ev,
    use_history,
    key,
    ev_min,
    ev_max,
    speed_up,
    speed_down,
    delta_time,
):
    """``AutoExposure.hlsl``: 256-sample log2-luminance average at a coarse
    mip -> target EV = log2(key) - avg, clamped, exponentially adapted.

    The 16x16 sample grid at mip (log2(maxdim)-4) is equivalent to a 16x16
    block mean; we mean-pool directly.
    """
    h, w = hdr.shape[:2]
    gh, gw = min(16, h), min(16, w)
    ph, pw = h - h % gh, w - w % gw
    pooled = hdr[:ph, :pw].reshape(gh, ph // gh, gw, pw // gw, 3).mean(axis=(1, 3))
    lum = jnp.einsum("hwc,c->hw", jnp.maximum(pooled, 0.0), LUM_WEIGHTS)
    log_avg = jnp.mean(jnp.log2(jnp.maximum(lum, 1e-4)))
    return ev_adapt(
        log_avg, prev_ev, use_history, key, ev_min, ev_max,
        speed_up, speed_down, delta_time,
    )


def ev_adapt(
    log_avg, prev_ev, use_history, key, ev_min, ev_max,
    speed_up, speed_down, delta_time,
):
    """EV target + exponential temporal adaptation (``AutoExposure.hlsl``
    tail), shared by the single-chip and sharded exposure paths."""
    key_ev = jnp.log2(jnp.maximum(key, 1e-4))
    target = key_ev - log_avg
    target = jnp.clip(
        target, jnp.log2(jnp.maximum(ev_min, 1e-4)), jnp.log2(jnp.maximum(ev_max, 1e-4))
    )
    speed = jnp.where(target > prev_ev, speed_up, speed_down)
    alpha = jnp.clip(1.0 - jnp.exp(-delta_time * speed), 0.0, 1.0)
    adapted = prev_ev + (target - prev_ev) * alpha
    return jnp.where(use_history, adapted, target)


def pooled_log_luminance_slab(hdr_slab, row0, full_h: int, psum_fn):
    """Sharded-exact version of auto_exposure_ev's pooling: each device
    contributes its slab rows' partial sums to the global 16x16 cell grid
    (cells may straddle slab boundaries), psum makes the grid exact on every
    device, then the same mean-log2 reduction runs replicated.

    hdr_slab: (slab_h, W, 3); row0: traced i32 first global row.
    Returns log_avg (scalar), identical (up to fp sum order) to the
    single-chip 16x16 pooling over the assembled frame.
    """
    slab_h, w = hdr_slab.shape[:2]
    gh, gw = min(16, full_h), min(16, w)
    cell_h = full_h // gh
    ph, pw = gh * cell_h, w - w % gw
    r_global = row0 + jnp.arange(slab_h, dtype=jnp.int32)
    cell_of_row = jnp.clip(r_global // cell_h, 0, gh - 1)
    w_rows = (
        (cell_of_row[None, :] == jnp.arange(gh, dtype=jnp.int32)[:, None])
        & (r_global[None, :] < ph)
    ).astype(jnp.float32)  # (gh, slab_h)
    # row-pool by matmul (MXU), then column-pool by reshape like single-chip
    rowsum = jnp.einsum("gs,swc->gwc", w_rows, hdr_slab[:, :pw])
    cellsum = rowsum.reshape(gh, gw, pw // gw, 3).sum(axis=2)
    pooled = psum_fn(cellsum) / jnp.float32(cell_h * (pw // gw))
    lum = jnp.einsum("hwc,c->hw", jnp.maximum(pooled, 0.0), LUM_WEIGHTS)
    return jnp.mean(jnp.log2(jnp.maximum(lum, 1e-4)))


def pbr_neutral_tonemap(color: jnp.ndarray) -> jnp.ndarray:
    """Khronos PBR Neutral (``Tonemap.hlsl:34-57``)."""
    start_compression = 0.8 - 0.04
    desaturation = 0.15

    x = jnp.min(color, axis=-1, keepdims=True)
    offset = jnp.where(x < 0.08, x - 6.25 * x * x, 0.04)
    c = color - offset

    peak = jnp.max(c, axis=-1, keepdims=True)
    d = 1.0 - start_compression
    new_peak = 1.0 - d * d / (peak + d - start_compression)
    compressed = c * (new_peak / jnp.maximum(peak, 1e-4))
    g = 1.0 - 1.0 / (desaturation * (peak - new_peak) + 1.0)
    desat = compressed + (new_peak - compressed) * g
    return jnp.where(peak < start_compression, c, desat)


@named_pass("Tonemap")
def tonemap(
    hdr: jnp.ndarray,
    exposure,
    exposure_ev,
    enable_tonemap: bool,
    enable_auto_exposure: bool,
    gamma,
) -> jnp.ndarray:
    """``Tonemap.hlsl`` PSMain: exposure (x exp2(EV)) -> PBR neutral ->
    saturate -> gamma."""
    final_exposure = exposure
    if enable_auto_exposure:
        final_exposure = final_exposure * jnp.exp2(exposure_ev)
    color = hdr * final_exposure
    if enable_tonemap:
        color = pbr_neutral_tonemap(color)
    color = jnp.clip(color, 0.0, 1.0)
    return color ** (1.0 / jnp.maximum(gamma, 1e-3))


@named_pass("CAS")
def cas_sharpen(color: jnp.ndarray, sharpness, pad_fn=None) -> jnp.ndarray:
    """``Cas.hlsl`` (AMD RCAS-style): cross-tap luma sharpening.
    color: (H, W, 3) in [0,1] post-tonemap.  pad_fn as in temporal_aa."""
    rcas_peak = 8.0 - 3.0
    rcas_inv_peak = 1.0 / rcas_peak
    eps = 0.0001

    if pad_fn is None:
        pad = jnp.pad(color, ((1, 1), (1, 1), (0, 0)), mode="edge")
    else:
        pad = pad_fn(color)
    h, w = color.shape[:2]
    c = color
    n = pad[0:h, 1 : 1 + w]
    s = pad[2 : 2 + h, 1 : 1 + w]
    wv = pad[1 : 1 + h, 0:w]
    e = pad[1 : 1 + h, 2 : 2 + w]

    def luma(x):
        return jnp.einsum("hwc,c->hw", x, LUM_WEIGHTS)

    cl, nl, wl, el, sl = luma(c), luma(n), luma(wv), luma(e), luma(s)

    min_rgb = jnp.minimum(jnp.minimum(jnp.minimum(n, wv), jnp.minimum(e, s)), c)
    max_rgb = jnp.maximum(jnp.maximum(jnp.maximum(n, wv), jnp.maximum(e, s)), c)
    inv_max = 1.0 / (max_rgb + eps)
    amp = jnp.clip(jnp.minimum(min_rgb, 2.0 - max_rgb) * inv_max, 0.0, 1.0)
    amp = jax_rsqrt(amp + eps)

    wgt = -rcas_inv_peak / jnp.einsum("hwc,c->hw", amp, LUM_WEIGHTS)
    sum_l = nl + wl + el + sl
    inv_den = 1.0 / (4.0 * wgt + 1.0)
    sharp_l = jnp.clip((sum_l * wgt + cl) * inv_den, 0.0, 1.0)

    chroma = c - cl[..., None]
    sharp_color = chroma + sharp_l[..., None]
    return c + (sharp_color - c) * sharpness


def jax_rsqrt(x):
    import jax

    return jax.lax.rsqrt(x)
