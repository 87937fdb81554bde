from tissue_image_processing_tpu.projection.surface import (  # noqa: F401
    time_point_surface_projection,
    build_continuous_manifold,
)
from tissue_image_processing_tpu.projection.driver import (  # noqa: F401
    movie_surface_projection,
    large_image_projection,
)
