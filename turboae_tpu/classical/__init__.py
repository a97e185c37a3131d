from .trellis import Trellis, turbo757_trellis, turbo_lte_trellis  # noqa: F401
from .interleavers import RandInterlv  # noqa: F401
from .convcode import conv_encode, conv_encode_batch, viterbi_decode  # noqa: F401
from .turbo import (turbo_encode, turbo_encode_batch, turbo_decode,  # noqa: F401
                    hazzys_turbo_decode, hazzys_g_turbo_decode,
                    make_jax_turbo_decoder)
from .bcjr import map_decode, make_jax_map_decoder  # noqa: F401
from .ldpc import (get_ldpc_code_params, gallager_ldpc_design,  # noqa: F401
                   ldpc_bp_decode, make_jax_ldpc_decoder)
from .gfields import GF, polydivide, polymultiply, poly_to_string  # noqa: F401
from .algcode import cyclic_code_genpoly  # noqa: F401
from .channels import corrupt_signal, awgn, bsc, bec, get_test_sigmas  # noqa: F401
from .modem import PSKModem, QAMModem, ofdm_tx, ofdm_rx, mimo_ml  # noqa: F401
from .dsp import (rcosfilter, rrcosfilter, gaussianfilter, rectfilter,  # noqa: F401
                  pnsequence, zcsequence, add_frequency_offset)
from .utilities import hamming_dist, euclid_dist, upsample, dec2bitarray, bitarray2dec  # noqa: F401
