"""Trellis tables for rate-k/n convolutional codes.

Reimplements the table semantics of commpy's Trellis
(reference: commpy/channelcoding/convcode.py:70-225) — including its
dec2bitarray index-wrap quirk for polynomials wider than the bit_width —
validated against the golden tables in the reference tests
(tests/test_convcode.py:14-43).

Only k=1 codes are exercised anywhere in the reference (Turbo-757 G=[7,5]
fb=7, Turbo-LTE G=[13,11] fb=13, and the [5,7] test code); k>1 raises.

Tables are tiny (2^M x 2) and built once at startup on the host; the JAX/TPU
decoders consume them as constant arrays.
"""
from __future__ import annotations

import numpy as np


def dec2bitarray(in_number: int, bit_width: int) -> np.ndarray:
    """MSB-first bit array, replicating commpy's negative-index wrap for
    values wider than bit_width (commpy/utilities.py:24-50)."""
    binary_string = bin(int(in_number))
    length = len(binary_string)
    bitarray = np.zeros(bit_width, 'int')
    for i in range(length - 2):
        bitarray[bit_width - i - 1] = int(binary_string[length - i - 1])
    return bitarray


def bitarray2dec(in_bitarray) -> int:
    number = 0
    for i in range(len(in_bitarray)):
        number += int(in_bitarray[i]) * (2 ** (len(in_bitarray) - 1 - i))
    return number


class Trellis:
    """next_state_table / output_table for a k=1 rate-1/n convolutional code.

    memory: 1-element array [M]; g_matrix: (1, n) octal generator polys;
    feedback: octal feedback poly (RSC when code_type='rsc', which overwrites
    the diagonal with the feedback poly, convcode.py:159-161).
    """

    def __init__(self, memory, g_matrix, feedback: int = 0,
                 code_type: str = 'default'):
        memory = np.atleast_1d(np.asarray(memory))
        g_matrix = np.array(g_matrix, dtype=int, ndmin=2)
        self.k, self.n = g_matrix.shape
        if self.k != 1:
            raise NotImplementedError('only k=1 convolutional codes supported '
                                      '(all codes in the reference are k=1)')
        if code_type == 'rsc':
            g_matrix = g_matrix.copy()
            g_matrix[0][0] = feedback

        M = int(memory.sum())
        self.total_memory = M
        self.number_states = 2 ** M
        self.number_inputs = 2 ** self.k
        self.code_type = code_type

        fb_taps = dec2bitarray(feedback, M)                       # over state bits
        gen_bits = [dec2bitarray(g_matrix[0][r], M + 1) for r in range(self.n)]

        nst = np.zeros((self.number_states, self.number_inputs), 'int')
        out = np.zeros((self.number_states, self.number_inputs), 'int')

        for state in range(self.number_states):
            sr = dec2bitarray(state, M)                           # sr[0] = oldest? (MSB of state)
            fb = int((fb_taps * sr).sum())                        # NOT reduced mod 2 (convcode.py:199)
            for u in range(self.number_inputs):
                outbits = np.zeros(self.n, 'int')
                for r in range(self.n):
                    # state contribution: taps g[1:] against register (convcode.py:193-195)
                    contrib = int((sr * gen_bits[r][1:]).sum()) % 2
                    # input + feedback contribution (convcode.py:213-215)
                    outbits[r] = (contrib + ((u * gen_bits[r][0] + fb) % 2)) % 2
                new_sr = np.empty(M, 'int')
                new_sr[1:] = sr[:-1]
                new_sr[0] = (u + fb) % 2                          # convcode.py:200-203
                out[state][u] = bitarray2dec(outbits)
                nst[state][u] = bitarray2dec(new_sr)

        self.next_state_table = nst
        self.output_table = out

    def visualize(self, trellis_length: int = 2, state_order=None,
                  state_radius: float = 0.04, edge_colors=None,
                  save_path: str = None):
        """Draw a trellis diagram section with matplotlib.

        Parity with commpy's Trellis.visualize
        (reference commpy/channelcoding/convcode.py:283-338): states as
        circles in columns, one column per time step, edges colored by input
        bit and labeled with the output bits. `save_path` writes a PNG
        instead of showing interactively (headless-friendly).
        """
        import matplotlib
        if save_path:
            matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        if state_order is None:
            state_order = list(range(self.number_states))
        if edge_colors is None:
            edge_colors = ['#9E1BE0', '#06D65D', '#E0CC38', '#2D56E0']
        ns = self.number_states
        fig, ax = plt.subplots(figsize=(2.5 * trellis_length, 0.8 * ns))
        for t in range(trellis_length):
            for si, s in enumerate(state_order):
                x, y = t, ns - 1 - si
                ax.add_patch(plt.Circle((x, y), state_radius * ns,
                                        fill=False, color='k'))
                ax.text(x, y, str(s), ha='center', va='center', fontsize=8)
                if t == trellis_length - 1:
                    continue
                for u in range(self.number_inputs):
                    nxt = int(self.next_state_table[s, u])
                    yn = ns - 1 - state_order.index(nxt)
                    ax.plot([x + state_radius * ns, t + 1 - state_radius * ns],
                            [y, yn], color=edge_colors[u % len(edge_colors)],
                            lw=1)
                    out = dec2bitarray(self.output_table[s, u], self.n)
                    ax.text(x + 0.25, y + (yn - y) * 0.25 + 0.06,
                            ''.join(map(str, out)), fontsize=6,
                            color=edge_colors[u % len(edge_colors)])
        ax.set_xlim(-0.5, trellis_length - 0.5)
        ax.set_ylim(-0.7, ns - 0.3)
        ax.axis('off')
        ax.set_title(f'{self.number_states}-state trellis '
                     f'(k={self.k}, n={self.n})')
        if save_path:
            fig.savefig(save_path, dpi=120, bbox_inches='tight')
            plt.close(fig)
        else:
            plt.show()
        return fig

    # decomposed bit tables handy for vectorized encoders/decoders
    def output_bits(self) -> np.ndarray:
        """(states, inputs, n) binary output table."""
        tbl = np.zeros((self.number_states, self.number_inputs, self.n), 'int')
        for s in range(self.number_states):
            for u in range(self.number_inputs):
                tbl[s, u] = dec2bitarray(self.output_table[s, u], self.n)
        return tbl


def turbo757_trellis() -> Trellis:
    """Turbo-757 component code (reference encoders.py:784-787)."""
    return Trellis(np.array([2]), np.array([[7, 5]]), feedback=7)


def turbo_lte_trellis() -> Trellis:
    """Turbo-LTE component code (reference encoders.py:780-783)."""
    return Trellis(np.array([3]), np.array([[13, 11]]), feedback=13)
