from tissue_image_processing_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, shard_params, unet_train_step_sharded,
)
