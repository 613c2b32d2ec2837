from pggan_tpu.ops.primitives import (
    nf,
    pixelnorm,
    minibatch_stddev,
    upsample_nearest_2x,
    avg_pool_2x,
    equalized_conv2d,
    equalized_dense,
    conv_init,
    dense_init,
    he_constant,
    leaky_relu,
)

__all__ = [
    "nf",
    "pixelnorm",
    "minibatch_stddev",
    "upsample_nearest_2x",
    "avg_pool_2x",
    "equalized_conv2d",
    "equalized_dense",
    "conv_init",
    "dense_init",
    "he_constant",
    "leaky_relu",
]
