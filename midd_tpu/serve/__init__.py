from midd_tpu.serve.codec import decode_to_tensor, tensor_to_base64_png  # noqa: F401
from midd_tpu.serve.engine import EngineConfig, InferenceEngine  # noqa: F401
from midd_tpu.serve.server import make_server, serve_forever  # noqa: F401
