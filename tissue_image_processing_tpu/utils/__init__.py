from tissue_image_processing_tpu.utils import maintenance  # noqa: F401
