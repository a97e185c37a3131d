from . import conv1d, gru, interleave, power, ste, activations  # noqa: F401
