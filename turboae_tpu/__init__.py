"""turboae_tpu — TPU-native neural channel-coding framework (TurboAE-class).

A ground-up JAX/XLA/Pallas re-design of the capabilities of yihanjiang/turboae:
learned turbo-autoencoder channel codes, classical codec oracles, channel
simulators, and the training/eval stack, built for TPU meshes.
"""
from .config import Config, get_args  # noqa: F401

__version__ = '0.1.0'
