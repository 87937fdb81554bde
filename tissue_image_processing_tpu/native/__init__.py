"""Native host kernels (C++ via ctypes): exact sequential oracles / CPU fallbacks
for the data-parallel TPU kernels. Compiled on demand with g++; every entry point
degrades gracefully to the pure-python oracle when no compiler is available."""

from tissue_image_processing_tpu.native.build import load_library  # noqa: F401
from tissue_image_processing_tpu.native.watershed_host import (  # noqa: F401
    meyer_watershed_native, native_available,
)
