from .app import create_app  # requires fastapi at call time, not import time
from .cli import main as cli_main
from .http_server import TTSService, make_server

__all__ = ["TTSService", "cli_main", "create_app", "make_server"]
