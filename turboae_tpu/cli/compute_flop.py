"""FLOP/param counter CLI (reference compute_flop.py)."""
from __future__ import annotations


def main(argv=None):
    from ..config import get_args
    from ..utils.flops import report
    cfg = get_args(argv)
    return report(cfg)


if __name__ == '__main__':
    main()
