"""Viterbi over the binary-input AWGN channel.

Mirrors reference commpy/examples/BAWGN_viterbi.py: rate-1/2 [7,5] code,
soft-decision (unquantized) decoding, BER vs SNR.

Run: python examples/viterbi_bawgn.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from turboae_tpu.cli.conv_benchmark import main

if __name__ == '__main__':
    main(['-enc1', '7', '-enc2', '5', '-M', '2', '-num_block', '2000',
          '-snr_test_start', '0', '-snr_test_end', '6', '-snr_points', '4']
         + sys.argv[1:])
