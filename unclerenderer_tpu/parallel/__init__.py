from .multichip import render_frame_multichip, make_render_mesh
