from .trellis import Trellis, turbo757_trellis, turbo_lte_trellis  # noqa: F401
from .interleavers import RandInterlv  # noqa: F401
from .convcode import conv_encode, conv_encode_batch, viterbi_decode  # noqa: F401
from .turbo import (turbo_encode, turbo_encode_batch, turbo_decode,  # noqa: F401
                    hazzys_turbo_decode, make_jax_turbo_decoder)
from .bcjr import map_decode, make_jax_map_decoder  # noqa: F401
