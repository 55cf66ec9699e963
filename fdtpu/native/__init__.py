"""Native (C++) host-side components: the fast image loader (``loader.py``)
and the JAX-free .fdn inference engine (``infer.py``)."""

from fdtpu.native.infer import (  # noqa: F401
    NativeDetector,
    build_cli,
    native_infer_available,
)
from fdtpu.native.loader import (  # noqa: F401
    decode_resize,
    decode_resize_batch,
    native_available,
)
