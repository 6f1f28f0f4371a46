from .raster import (
    RasterSetup,
    viewport_homogeneous,
    triangle_setup,
    rasterize,
    CULL_NONE,
    CULL_BACK,
    CULL_FRONT,
    DEPTH_MAX,
    DEPTH_MIN,
)
from .interpolate import barycentrics, interpolate, interpolate_many
