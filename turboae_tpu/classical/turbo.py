"""Classical Turbo encode/decode (the bit-exact oracle for DeepTurbo & benchmarks).

Reference: commpy/channelcoding/turbo.py:15-518. Encoding: two RSC component
encoders in parallel concatenation; stream 2 encodes the interleaved
systematic bits with puncture [[0,1]] (parity only); termination tails trimmed.
Decoding: iterative extrinsic exchange between two MAP decoders;
`hazzys_turbo_decode` additionally subtracts the weighted systematic LLR
2*y_s/sigma^2 each pass and decides from L_ext1 + L_int1 + weighted_sys.

TPU path: make_jax_turbo_decoder composes the batched log-domain BCJR
(bcjr.make_jax_map_decoder) with device-side interleaving — whole SNR sweeps
of thousands of blocks decode in one XLA program (the reference fans out
per-block Python over mp.Pool, turbo_codes_benchmark.py:132-133).
"""
from __future__ import annotations

import numpy as np

from .bcjr import map_decode, make_jax_map_decoder
from .convcode import conv_encode, conv_encode_batch
from .trellis import Trellis


def turbo_encode(msg_bits, trellis1: Trellis, trellis2: Trellis, interleaver):
    """[sys, par1, par2] streams (reference turbo.py:15-60)."""
    stream = conv_encode(msg_bits, trellis1, 'rsc')
    sys_stream = stream[::2]
    non_sys_stream_1 = stream[1::2]

    interlv_msg_bits = interleaver.interlv(sys_stream)
    non_sys_stream_2 = conv_encode(interlv_msg_bits, trellis2, 'rsc',
                                   puncture_matrix=np.array([[0, 1]]))

    M = trellis1.total_memory
    return [sys_stream[:-M], non_sys_stream_1[:-M], non_sys_stream_2[:-M]]


def turbo_encode_batch(msgs: np.ndarray, trellis: Trellis, p_array) -> np.ndarray:
    """Vectorized turbo encoder: (B, L) -> (B, L, 3) [sys, par1, par2].

    Matches turbo_encode per row. Note stream 2 re-encodes the interleaved
    *systematic output* (== message bits for these feedback codes since
    g[0][0]==feedback makes output 0 systematic)."""
    B, L = msgs.shape
    M = trellis.total_memory
    p_array = np.asarray(p_array)
    s1 = conv_encode_batch(msgs, trellis, 'rsc').reshape(B, L + M, 2)
    sys_full = s1[:, :, 0]
    par1 = s1[:, :, 1]
    # The reference interleaves the length-(L+M) sys stream with a length-L
    # p_array (turbo.py:52 with RandInterlv(block_len, 0)), i.e. fancy-indexing
    # that permutes the first L entries and DROPS the termination tail:
    inter = sys_full[:, p_array]
    s2 = conv_encode_batch(inter, trellis, 'rsc').reshape(B, L + M, 2)
    par2 = s2[:, :, 1]
    return np.stack([sys_full[:, :L], par1[:, :L], par2[:, :L]], axis=2)


def turbo_decode(sys_symbols, non_sys_symbols_1, non_sys_symbols_2,
                 trellis: Trellis, noise_variance, number_iterations,
                 interleaver, L_int=None):
    """Standard iterative turbo decoder (reference turbo.py:262-341)."""
    if L_int is None:
        L_int = np.zeros(len(sys_symbols))
    L_int_1 = L_int
    sys_symbols_i = interleaver.interlv(sys_symbols)

    for it in range(number_iterations):
        L_ext_1, _ = map_decode(sys_symbols, non_sys_symbols_1, trellis,
                                noise_variance, L_int_1, 'compute')
        L_ext_1 = L_ext_1 - L_int_1
        L_int_2 = interleaver.interlv(L_ext_1)
        mode = 'decode' if it == number_iterations - 1 else 'compute'
        L_2, decoded_bits = map_decode(sys_symbols_i, non_sys_symbols_2,
                                       trellis, noise_variance, L_int_2, mode)
        L_ext_2 = L_2 - L_int_2
        L_int_1 = interleaver.deinterlv(L_ext_2)

    return interleaver.deinterlv(decoded_bits)


def hazzys_turbo_decode(sys_symbols, non_sys_symbols_1, non_sys_symbols_2,
                        trellis: Trellis, noise_variance, number_iterations,
                        interleaver, L_int=None):
    """The benchmark's variant (reference turbo.py:346-428): subtracts the
    weighted systematic LLR 2*y_s/sigma^2 from each extrinsic, decides from
    L_ext_1 + L_int_1 + weighted_sys."""
    if L_int is None:
        L_int = np.zeros(len(sys_symbols))
    L_int_1 = L_int
    sys_symbols_i = interleaver.interlv(sys_symbols)
    weighted_sys = 2.0 * np.asarray(sys_symbols) / noise_variance

    for _ in range(number_iterations):
        L_ext_1, _ = map_decode(sys_symbols, non_sys_symbols_1, trellis,
                                noise_variance, L_int_1, 'compute')
        L_ext_1 = L_ext_1 - L_int_1 - weighted_sys
        L_int_2 = interleaver.interlv(L_ext_1)

        L_2, _ = map_decode(sys_symbols_i, non_sys_symbols_2, trellis,
                            noise_variance, L_int_2, 'compute')
        L_ext_2 = L_2 - L_int_2
        L_int_1 = interleaver.deinterlv(L_ext_2) - weighted_sys

    return (L_ext_1 + L_int_1 + weighted_sys > 0).astype(int)


def hazzys_g_turbo_decode(sys_symbols, non_sys_symbols_1, non_sys_symbols_2,
                          trellis: Trellis, noise_variance, number_iterations,
                          interleaver, L_int=None):
    """Damped hazzys variant (reference turbo.py:433-518): each extrinsic is
    attenuated by 0.9*exp(-0.01*|L|) before being passed on; decision from the
    *damped* L_ext_1 + L_int_1 + weighted_sys."""
    if L_int is None:
        L_int = np.zeros(len(sys_symbols))
    L_int_1 = L_int
    sys_symbols_i = interleaver.interlv(sys_symbols)
    weighted_sys = 2.0 * np.asarray(sys_symbols) / noise_variance

    for _ in range(number_iterations):
        L_ext_1, _ = map_decode(sys_symbols, non_sys_symbols_1, trellis,
                                noise_variance, L_int_1, 'compute')
        L_ext_1 = L_ext_1 - L_int_1 - weighted_sys
        L_ext_1 = L_ext_1 * 0.9 * np.exp(-0.01 * np.abs(L_ext_1))
        L_int_2 = interleaver.interlv(L_ext_1)

        L_2, _ = map_decode(sys_symbols_i, non_sys_symbols_2, trellis,
                            noise_variance, L_int_2, 'compute')
        L_ext_2 = L_2 - L_int_2
        L_ext_2 = L_ext_2 * 0.9 * np.exp(-0.01 * np.abs(L_ext_2))
        L_int_1 = interleaver.deinterlv(L_ext_2) - weighted_sys

    return (L_ext_1 + L_int_1 + weighted_sys > 0).astype(int)


# ---------------------------------------------------------------------------
# TPU path: fully batched turbo decoder
# ---------------------------------------------------------------------------

def make_jax_turbo_decoder(trellis: Trellis, p_array, number_iterations: int,
                           variant: str = 'hazzys'):
    """Jittable batched turbo decoder.

    fn(sys (B,L), par1 (B,L), par2 (B,L), noise_variance) -> bits (B,L) int32.
    variant 'hazzys' reproduces hazzys_turbo_decode; 'standard' turbo_decode;
    'hazzys_g' the damped hazzys_g_turbo_decode (turbo.py:433-518).
    """
    import jax
    import jax.numpy as jnp

    map_dec = make_jax_map_decoder(trellis)
    p = jnp.asarray(np.asarray(p_array))
    inv = jnp.zeros_like(p).at[p].set(jnp.arange(p.shape[0]))

    def decode(sys_symbols, par1, par2, noise_variance):
        B, L = sys_symbols.shape
        sys_i = sys_symbols[:, p]
        L_int_1 = jnp.zeros((B, L))
        weighted_sys = 2.0 * sys_symbols / noise_variance

        def damp(L):
            return L * 0.9 * jnp.exp(-0.01 * jnp.abs(L))

        def body(carry, _):
            L_int_1, L_ext_1_prev, _ = carry
            L_post_1 = map_dec(sys_symbols, par1, noise_variance, L_int_1)
            if variant in ('hazzys', 'hazzys_g'):
                L_ext_1 = L_post_1 - L_int_1 - weighted_sys
            else:
                L_ext_1 = L_post_1 - L_int_1
            if variant == 'hazzys_g':
                L_ext_1 = damp(L_ext_1)
            L_int_2 = L_ext_1[:, p]
            L_post_2 = map_dec(sys_i, par2, noise_variance, L_int_2)
            L_ext_2 = L_post_2 - L_int_2
            if variant == 'hazzys_g':
                L_ext_2 = damp(L_ext_2)
            new_L_int_1 = L_ext_2[:, inv]
            if variant in ('hazzys', 'hazzys_g'):
                new_L_int_1 = new_L_int_1 - weighted_sys
            return (new_L_int_1, L_ext_1, L_post_2), None

        (L_int_1, L_ext_1, L_post_2), _ = jax.lax.scan(
            body, (L_int_1, jnp.zeros((B, L)), jnp.zeros((B, L))), None,
            length=number_iterations)

        if variant in ('hazzys', 'hazzys_g'):
            return (L_ext_1 + L_int_1 + weighted_sys > 0).astype(jnp.int32)
        # standard: decision from decoder 2's posterior of the FINAL
        # iteration, deinterleaved (host turbo_decode above / reference
        # turbo.py:320-341) — carried out of the scan, not recomputed (an
        # extra map_dec pair would be an N+1-th iteration)
        return (L_post_2[:, inv] > 0).astype(jnp.int32)

    return decode


def make_jax_turbo_mc(trellis: Trellis, p_array, number_iterations: int,
                      variant: str = 'hazzys', batch: int = 4096):
    """Fully on-device Monte-Carlo step for classical turbo over AWGN.

    One fused XLA program per call: sample bits -> turbo-encode (table-driven
    lax.scan, bit-exact vs the host oracle — see models/deepturbo.py tests)
    -> BPSK + AWGN -> iterative batched log-BCJR decode -> error tallies.
    Removes the host encode/noise bottleneck (~1.3k blocks/s on this box)
    that otherwise caps deep-tail sweeps; the reference fans out per-block
    Python over mp.Pool instead (commpy/turbo_codes_benchmark.py, ~1
    block/s/core).

    fn(key, sigma) -> (bit_errors, block_errors) int32 scalars on device.
    """
    import jax
    import jax.numpy as jnp

    from .convcode import make_jax_encoder

    enc = make_jax_encoder(trellis, 'rsc')
    dec = make_jax_turbo_decoder(trellis, p_array, number_iterations, variant)
    M = trellis.total_memory
    p_np = np.asarray(p_array)
    L = p_np.shape[0]

    def step(key, sigma):
        p = jnp.asarray(p_np)
        kb, kn = jax.random.split(key)
        msgs = jax.random.bernoulli(kb, 0.5, (batch, L)).astype(jnp.int32)
        s1 = enc(msgs).reshape(batch, L + M, 2)
        sys_full = s1[:, :, 0]
        par1 = s1[:, :L, 1]
        # length-L p_array permutes the first L entries of the padded sys
        # stream and drops the termination tail (commpy interlv semantics)
        inter = jnp.take(sys_full, p, axis=1)
        s2 = enc(inter).reshape(batch, L + M, 2)
        par2 = s2[:, :L, 1]
        codes = jnp.stack([sys_full[:, :L], par1, par2], axis=2).astype(
            jnp.float32)
        rx = 2.0 * codes - 1.0 + sigma * jax.random.normal(kn, codes.shape)
        bits = dec(rx[:, :, 0], rx[:, :, 1], rx[:, :, 2], sigma ** 2)
        err = bits != msgs
        return err.sum(), (err.sum(axis=1) > 0).sum()

    return jax.jit(step)
