"""Native (C++) host-side components. See ``loader.py``."""

from fdtpu.native.loader import (  # noqa: F401
    decode_resize,
    decode_resize_batch,
    native_available,
)
