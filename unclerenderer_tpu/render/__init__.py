from .params import RenderSettings, FrameParams, DeviceScene, FrameState
from .renderer import Renderer
