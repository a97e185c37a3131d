"""Native (C++) oracle kernels, exposed via ctypes.

Builds lazily with g++ on first use (cached as libturbo_native.so next to this
file); falls back to None when no compiler is available — callers must treat
`load_native() is None` as "use the numpy oracle path".
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'kernels.cpp')
_SO = os.path.join(_DIR, 'libturbo_native.so')

_lib = None
_tried = False


def build(force: bool = False) -> Optional[str]:
    if os.path.exists(_SO) and not force and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-pthread',
             '-o', _SO, _SRC],
            check=True, capture_output=True)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def load_native():
    """Return the ctypes lib with argtypes configured, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so = build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    d = ctypes.POINTER(ctypes.c_double)
    i = ctypes.POINTER(ctypes.c_int32)
    lib.bcjr_map_decode.argtypes = [d, d, ctypes.c_int, i, d, d,
                                    ctypes.c_int, ctypes.c_int,
                                    ctypes.c_double, d, d]
    lib.turbo_decode_hazzys.argtypes = [d, d, d, ctypes.c_int, i, d, d,
                                        ctypes.c_int, ctypes.c_int,
                                        ctypes.c_double, ctypes.c_int, i, i]
    lib.turbo_decode_hazzys_batch.argtypes = [d, d, d, ctypes.c_int,
                                              ctypes.c_int, i, d, d,
                                              ctypes.c_int, ctypes.c_int,
                                              ctypes.c_double, ctypes.c_int,
                                              i, i]
    lib.turbo_decode_batch_mt.argtypes = [d, d, d, ctypes.c_int,
                                          ctypes.c_int, i, d, d,
                                          ctypes.c_int, ctypes.c_int,
                                          ctypes.c_double, ctypes.c_int,
                                          i, ctypes.c_int, ctypes.c_int, i]
    lib.viterbi_full.argtypes = [d, ctypes.c_int, ctypes.c_int, i, i, d,
                                 ctypes.c_int, ctypes.c_int, ctypes.c_int, i]
    _lib = lib
    return _lib


def _cptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def native_turbo_decode_batch(sys, par1, par2, trellis, noise_variance,
                              num_iterations, p_array,
                              variant: str = 'hazzys',
                              num_threads: int = 0) -> Optional[np.ndarray]:
    """Batched turbo decode via C++ (multi-threaded over blocks); None if
    native unavailable. variant: 'hazzys' or 'hazzys_g' (damped).
    num_threads<=0 uses all hardware threads."""
    lib = load_native()
    if lib is None:
        return None
    sys = np.ascontiguousarray(sys, dtype=np.float64)
    par1 = np.ascontiguousarray(par1, dtype=np.float64)
    par2 = np.ascontiguousarray(par2, dtype=np.float64)
    B, L = sys.shape
    obits = trellis.output_bits().astype(np.float64)
    out_msg = np.ascontiguousarray(2.0 * obits[:, :, 0] - 1.0)
    out_par = np.ascontiguousarray(2.0 * obits[:, :, 1] - 1.0)
    nst = np.ascontiguousarray(trellis.next_state_table, dtype=np.int32)
    p = np.ascontiguousarray(np.asarray(p_array), dtype=np.int32)
    decoded = np.zeros((B, L), dtype=np.int32)
    var = {'hazzys': 0, 'hazzys_g': 1}[variant]
    lib.turbo_decode_batch_mt(
        _cptr(sys, ctypes.c_double), _cptr(par1, ctypes.c_double),
        _cptr(par2, ctypes.c_double), B, L,
        _cptr(nst, ctypes.c_int32), _cptr(out_msg, ctypes.c_double),
        _cptr(out_par, ctypes.c_double),
        trellis.number_states, trellis.number_inputs,
        float(noise_variance), int(num_iterations),
        _cptr(p, ctypes.c_int32), var, int(num_threads),
        _cptr(decoded, ctypes.c_int32))
    return decoded


def native_viterbi(received, trellis, decoding_type: str = 'unquantized'
                   ) -> Optional[np.ndarray]:
    """received: (T, n) symbols -> (T,) decoded bits; None if unavailable."""
    lib = load_native()
    if lib is None:
        return None
    received = np.ascontiguousarray(received, dtype=np.float64)
    T, n = received.shape
    S = trellis.number_states
    nst = trellis.next_state_table
    preds = [[] for _ in range(S)]
    for ps in range(S):
        for u in range(trellis.number_inputs):
            preds[nst[ps][u]].append((ps, u))
    P = len(preds[0])
    pred_state = np.ascontiguousarray(
        [[p0 for p0, _ in preds[s]] for s in range(S)], dtype=np.int32)
    pred_input = np.ascontiguousarray(
        [[u for _, u in preds[s]] for s in range(S)], dtype=np.int32)
    obits = trellis.output_bits()
    ideal = np.ascontiguousarray(
        obits[pred_state, pred_input].astype(np.float64))
    dt = {'hard': 0, 'unquantized': 1, 'tdist3': 2, 'tdist5': 3}[decoding_type]
    decoded = np.zeros(T, dtype=np.int32)
    lib.viterbi_full(_cptr(received, ctypes.c_double), T, n,
                     _cptr(pred_state, ctypes.c_int32),
                     _cptr(pred_input, ctypes.c_int32),
                     _cptr(ideal, ctypes.c_double), S, P, dt,
                     _cptr(decoded, ctypes.c_int32))
    return decoded
