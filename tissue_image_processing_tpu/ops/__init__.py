"""Jitted array kernels: the TPU-native equivalents of the reference's
scipy/skimage hot loops (reference ``basic_image_manipulations.py``,
``tissue_info.py`` regionprops/filter call sites)."""

from tissue_image_processing_tpu.ops.filters import (  # noqa: F401
    gaussian_blur,
    band_pass_filter,
)
from tissue_image_processing_tpu.ops.percentile import (  # noqa: F401
    percentile,
    masked_percentile,
)
from tissue_image_processing_tpu.ops.brightness import (  # noqa: F401
    set_channel_brightness,
    set_brightness,
    binary_image,
    adjust_gamma,
)
from tissue_image_processing_tpu.ops.morphology import (  # noqa: F401
    maximum_filter,
    minimum_filter,
    plus_maximum_filter,
    plus_minimum_filter,
    binary_dilation,
    binary_erosion,
    grey_dilation,
    grey_erosion,
)
from tissue_image_processing_tpu.ops.components import (  # noqa: F401
    connected_components,
    relabel_sequential,
)
from tissue_image_processing_tpu.ops.local_threshold import threshold_local_max  # noqa: F401
from tissue_image_processing_tpu.ops.watershed import (  # noqa: F401
    regional_minima_labels,
    watershed,
    watershed_segmentation,
)
from tissue_image_processing_tpu.ops.drift import phase_cross_correlation, calculate_drift  # noqa: F401
from tissue_image_processing_tpu.ops.regionprops import regionprops  # noqa: F401
from tissue_image_processing_tpu.ops.neighbors import (  # noqa: F401
    adjacency_matrix,
    neighbor_lists,
    contact_length_matrix,
    second_order_adjacency,
)
