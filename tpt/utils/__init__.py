from .cache import enable_persistent_cache
from .image import write_png, image_to_uint8_rows

__all__ = ["write_png", "image_to_uint8_rows", "enable_persistent_cache"]
