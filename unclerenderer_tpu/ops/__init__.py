from .raster import (
    RasterSetup,
    viewport_homogeneous,
    triangle_setup,
    triangle_setup_expanded,
    rasterize,
    CULL_NONE,
    CULL_BACK,
    CULL_FRONT,
    DEPTH_MAX,
    DEPTH_MIN,
)
