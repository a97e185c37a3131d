from .noise import generate_noise, sample_noise, NoiseSpec, spec_from_cfg  # noqa: F401
from .apply import apply_channel  # noqa: F401
