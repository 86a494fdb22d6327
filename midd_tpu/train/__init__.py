from midd_tpu.train import metrics  # noqa: F401
