from midd_tpu.utils.checkpoint import (  # noqa: F401
    import_reference_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from midd_tpu.utils.logging import JsonLogger, get_logger  # noqa: F401
from midd_tpu.utils.profiling import Timer, device_trace  # noqa: F401
