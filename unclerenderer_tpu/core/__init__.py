from .logging import get_logger, set_log_level, log_info, log_warning, log_error, log_verbose
from .config import RendererConfig, load_config
