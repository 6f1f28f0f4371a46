from .image import load_image, default_grid_texture, solid_color_texture, TextureCache
from .dds import load_dds, DdsImage
from .png import decode_png
from .atlas import TextureAtlas, build_atlas, build_pyramid_quad_atlas
