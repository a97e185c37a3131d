"""BER-curve plotting (reference results/fbresults.py made reusable).

plot_curves(runs) takes {label: {'snr': [...], 'ber': [...]}} dicts (ours or
the published reference tables in reference_curves.py) and writes a semilogy
comparison figure.
"""
from __future__ import annotations

from typing import Dict


def plot_curves(runs: Dict[str, dict], out_path: str = 'ber_curves.png',
                ylabel: str = 'BER', title: str = 'BER vs SNR'):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    for label, data in runs.items():
        key = 'ber' if 'ber' in data else 'fer'
        ax.semilogy(data['snr'], data[key], marker='o', label=label)
    ax.set_xlabel('SNR (dB)')
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.grid(True, which='both', alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    return out_path


def parse_log(path: str) -> dict:
    """Scrape a training log for the final BER/BLER arrays
    (reference tmp/readlines.py pattern)."""
    import ast
    snr, ber, bler = None, None, None
    with open(path) as f:
        lines = f.readlines()
    for i, line in enumerate(lines):
        if line.startswith('final results on SNRs'):
            snr = ast.literal_eval(line.split('SNRs', 1)[1].strip())
        elif line.startswith('BER') and snr is not None and ber is None:
            ber = ast.literal_eval(line.split('BER', 1)[1].strip())
        elif line.startswith('BLER') and ber is not None and bler is None:
            bler = ast.literal_eval(line.split('BLER', 1)[1].strip())
    return {'snr': snr, 'ber': ber, 'bler': bler}
