from midd_tpu.diffusion.sampler import (  # noqa: F401
    denoise,
    make_denoise_fn,
    noise_images,
    sample_timesteps,
)
from midd_tpu.diffusion.schedule import (  # noqa: F401
    Schedule,
    make_schedule,
    timestep_sequence,
)
