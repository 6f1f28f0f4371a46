"""UncleRenderer-TPU: a TPU-native real-time renderer built from scratch in JAX/Pallas.

Same capabilities as the D3D12 reference renderer (UncleBrian3007/UncleRenderer):
glTF 2.0 scenes, forward + deferred PBR with IBL, directional shadow mapping with
PCF, GPU-driven frustum/HZB occlusion culling, sky atmosphere, TAA, auto-exposure,
PBR-neutral tonemap, and contrast-adaptive sharpening -- redesigned TPU-first:

* The D3D12 fixed-function raster pipeline becomes a tiled, sort-based
  *visibility-buffer* rasterizer where per-tile edge-function evaluation is a
  dense ``[pixels, 3] @ [3, 3K]`` matmul on the MXU and the reverse-Z depth test
  is a commutative max/argmax reduction (no scatter, no ordering).
* HLSL shaders become fused per-pixel JAX/Pallas kernels over HBM-resident
  G-buffer arrays.
* The render graph becomes a jit-traced pass schedule: XLA data dependence and
  buffer donation subsume barriers, transient pools and pass culling.
* Frame-carried state (TAA history, exposure EV, HZB) is an explicit pytree.
"""

__version__ = "0.1.0"
