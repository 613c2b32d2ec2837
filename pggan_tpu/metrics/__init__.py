from pggan_tpu.metrics.swd import (
    laplacian_levels,
    pyr_down,
    pyr_up,
    sliced_wasserstein,
    swd,
    swd_levels,
)

__all__ = [
    "laplacian_levels",
    "pyr_down",
    "pyr_up",
    "sliced_wasserstein",
    "swd",
    "swd_levels",
]
