"""Classical random interleaver — the MT19937 seed contract.

Reference: commpy/channelcoding/interleavers.py:13-82. RandInterlv(length, seed)
draws numpy.random.RandomState(seed).permutation(arange(length)); seed 0 is the
shared contract between the classical and neural stacks (channel_ae.py:33,
turbo_codes_benchmark.py:74)."""
from __future__ import annotations

import numpy as np
from numpy.random import mtrand


class RandInterlv:
    def __init__(self, length: int, seed: int):
        rand_gen = mtrand.RandomState(seed)
        self.p_array = rand_gen.permutation(np.arange(length))

    def interlv(self, in_array):
        in_array = np.asarray(in_array)
        return in_array[self.p_array]

    def deinterlv(self, in_array):
        in_array = np.asarray(in_array)
        out = np.zeros(len(in_array), in_array.dtype)
        out[self.p_array] = in_array
        return out
