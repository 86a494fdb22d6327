"""midd_tpu — TPU-native hybrid X-ray denoising framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`KushalChaudhari-16/Medical-Image-Denoising-Using-Diffusion` (reference mounted at
/root/reference). The reference is a flat PyTorch/FastAPI script collection; this
package is a layered TPU-first framework:

- ``midd_tpu.models``    — canonical Flax modules (NHWC, bf16-capable, fp32 norms)
- ``midd_tpu.diffusion`` — beta schedules + ``jax.lax.scan`` reverse samplers
- ``midd_tpu.ops``       — Pallas kernels (flash attention) with XLA fallbacks
- ``midd_tpu.parallel``  — device mesh / sharding (dp + tp over ICI)
- ``midd_tpu.train``     — losses, data pipeline, optax trainers, metrics
- ``midd_tpu.convert``   — torch ``.pth`` state_dict -> JAX param pytrees
- ``midd_tpu.serve``     — FastAPI app with the reference's exact HTTP contract
- ``midd_tpu.utils``     — checkpointing (orbax + metadata schema), logging
"""

__version__ = "0.1.0"
