from midd_tpu.ops.attention import mha, mha_reference  # noqa: F401
from midd_tpu.ops.image import (  # noqa: F401
    global_avg_pool,
    pad_to_multiple,
    pixel_shuffle,
    resize_bilinear,
)
