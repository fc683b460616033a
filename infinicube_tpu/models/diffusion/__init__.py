from infinicube_tpu.models.diffusion.schedulers import (  # noqa: F401
    NoiseSchedule, ddim_sample, ddpm_sample, dpmpp_sample,
)
