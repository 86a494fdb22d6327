from midd_tpu.benchmarks.xray_bench import (  # noqa: F401
    PROTOCOL_VERSION,
    make_eval_set,
    make_phantoms,
    score_engine,
    score_fn,
)
