from neuroquant_tpu.ops.pixelshuffle import pixel_shuffle  # noqa: F401
from neuroquant_tpu.ops.hadamard import (  # noqa: F401
    fwht, hadamard_along_channel_weight, next_power_of_two,
)
