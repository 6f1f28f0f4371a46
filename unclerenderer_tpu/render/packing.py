"""Record packing for the single-gather material resolve.

TPU gathers cost tens of ns per row regardless of row width, so the material
resolve packs *everything it needs per pixel* into one static per-triangle
record: the three vertices' attributes plus the owning model's material
constants.  At 2M pixels this turns ~25 separate gathers into one record
gather + one texture-quad gather per enabled slot.

Record layouts (float32 columns):

tri_attr (T, 97):
  [k*16 + 0..2]   vertex k position (world)
  [k*16 + 3..5]   vertex k normal (world, unnormalized)
  [k*16 + 6..9]   vertex k tangent (xyz normalized + handedness)
  [k*16 + 10..11] vertex k uv
  [k*16 + 12..15] vertex k color        (k = 0, 1, 2)
  [48..95]        model record (below)
  [96]            model id

model record (48):
  0..2 base_color_factor | 3 base_color_alpha | 4 metallic | 5 roughness
  6..8 emissive | 9 alpha_cutoff | 10 object_id | 11 alpha_mode
  12..15 has_map | 16..19 tex_ids | 20..35 uv offset-scale (4 slots x 4)
  36..43 uv rotation (4 slots x 2) | 44..47 pad
"""

from __future__ import annotations

import numpy as np

MREC = 48  # model record width
TREC = 48 + MREC + 1  # tri record width

# model record column offsets
M_BCF, M_ALPHA, M_METAL, M_ROUGH = 0, 3, 4, 5
M_EMISSIVE, M_CUTOFF, M_OBJID, M_AMODE = 6, 9, 10, 11
M_HAS, M_TEX, M_UVOS, M_UVROT = 12, 16, 20, 36


def pack_model_record(data, tex_ids: np.ndarray, has_map: np.ndarray) -> np.ndarray:
    """SceneData-like + texture assignment -> (M, 48) f32."""
    m = data.num_models
    rec = np.zeros((m, MREC), np.float32)
    rec[:, M_BCF : M_BCF + 3] = data.base_color_factor
    rec[:, M_ALPHA] = data.base_color_alpha
    rec[:, M_METAL] = data.metallic_factor
    rec[:, M_ROUGH] = data.roughness_factor
    rec[:, M_EMISSIVE : M_EMISSIVE + 3] = data.emissive_factor
    rec[:, M_CUTOFF] = data.alpha_cutoff
    rec[:, M_OBJID] = data.object_ids.astype(np.float32)
    rec[:, M_AMODE] = data.alpha_mode.astype(np.float32)
    rec[:, M_HAS : M_HAS + 4] = has_map.astype(np.float32)
    rec[:, M_TEX : M_TEX + 4] = tex_ids.astype(np.float32)
    rec[:, M_UVOS : M_UVOS + 16] = data.uv_transform.reshape(m, 16)
    rec[:, M_UVROT : M_UVROT + 8] = data.uv_rotation.reshape(m, 8)
    return rec


def pack_tri_attr(data, model_rec: np.ndarray) -> np.ndarray:
    """De-indexed SceneData -> (T, 97) f32 static tri record."""
    t = data.num_triangles
    rec = np.zeros((t, TREC), np.float32)
    for k in range(3):
        base = k * 16
        rows = slice(k, 3 * t, 3)
        rec[:, base + 0 : base + 3] = data.position[rows]
        rec[:, base + 3 : base + 6] = data.normal[rows]
        rec[:, base + 6 : base + 10] = data.tangent[rows]
        rec[:, base + 10 : base + 12] = data.uv[rows]
        rec[:, base + 12 : base + 16] = data.color[rows]
    rec[:, 48 : 48 + MREC] = model_rec[data.tri_model]
    rec[:, 96] = data.tri_model.astype(np.float32)
    return rec
