from pggan_tpu.utils.misc import (
    adjust_dynamic_range,
    create_result_subdir,
    load_pkl,
    numpy_upsample_nearest,
    random_latents,
    save_pkl,
)

__all__ = [
    "adjust_dynamic_range",
    "create_result_subdir",
    "load_pkl",
    "numpy_upsample_nearest",
    "random_latents",
    "save_pkl",
]
