from tissue_image_processing_tpu.models.unet import UNet, build_unet  # noqa: F401
from tissue_image_processing_tpu.models.predictor import SegmentationPredictor  # noqa: F401
