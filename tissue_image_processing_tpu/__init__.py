"""tissue_image_processing_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
confocal / light-sheet tissue movie analysis.

Built from scratch with the capabilities of ``kasirershahartau/tissue_image_processing``
(see SURVEY.md): surface projection, watershed + U-Net segmentation, per-frame cell
tables, cell-type classification, drift-corrected tracking, event detection, feature /
statistics engines and persistence — redesigned TPU-first so whole movies run on device
as batched tensors.

Layout
------
- ``ops``        : jitted array kernels (filters, watershed, regionprops, drift, ...)
- ``projection`` : z-stack -> 2-D surface projection (height maps, manifolds)
- ``models``     : Flax U-Net, predictor, trainer, Keras-weight import
- ``core``       : cell tables, Tissue session store, tracking, events, features
- ``parallel``   : mesh / sharding helpers, batched movie pipeline
- ``stats``      : cross-experiment statistical comparison (host side)
- ``io``         : TIFF / npy / zarr-style movie ingestion + export
"""

__version__ = "0.1.0"

from tissue_image_processing_tpu.config import PipelineConfig  # noqa: F401
