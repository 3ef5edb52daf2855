from .config import Config, MISSING
from .registry import get_class, import_from_path

__all__ = ["Config", "MISSING", "get_class", "import_from_path"]
