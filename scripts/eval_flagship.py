"""Full BER/BLER evaluation of a trained flagship checkpoint.

The BASELINE.json north-star protocol: rate-1/3, K=100, AWGN, 12 SNR points
from -1.5 to 4.0 dB at >=100k blocks per point.

Round 4: runs on the fast count-based sweep (Trainer.sweep — lax.scan-fused
batches, bf16 forward, exact int error counts, no punctured second pass),
~6x the old Trainer.test() rate. Deep floor statistics:

    python scripts/eval_flagship.py --ckpt artifacts/flagship.msgpack \
        --num_block 100000 --deep_num_block 1000000 --deep_from_snr 2.0 \
        --out artifacts/eval_crown_r4.json
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def wilson_ci(errors: int, n: int, z: float = 1.96):
    """95% Wilson interval from an exact error count."""
    if n == 0:
        return [0.0, 1.0]
    p_hat = errors / n
    denom = 1 + z * z / n
    center = (p_hat + z * z / (2 * n)) / denom
    half = z * math.sqrt(max(p_hat * (1 - p_hat) / n, 0)
                         + z * z / (4 * n * n)) / denom
    return [max(center - half, 0.0), center + half]


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--ckpt', default='artifacts/flagship.msgpack')
    p.add_argument('--num_block', type=int, default=100000)
    p.add_argument('--deep_num_block', type=int, default=0,
                   help='if >0, SNR points >= --deep_from_snr use this many '
                        'blocks instead (deep floor statistics)')
    p.add_argument('--deep_from_snr', type=float, default=2.0)
    p.add_argument('--batch_size', type=int, default=2000)
    p.add_argument('--snr_points', type=int, default=12)
    p.add_argument('--snr_test_start', type=float, default=-1.5)
    p.add_argument('--snr_test_end', type=float, default=4.0)
    p.add_argument('--out', default='logs/flagship_eval.json')
    p.add_argument('--encoder', default='TurboAE_rate3_cnn',
                   help='e.g. Turbo_rate3_757 for DeepTurbo checkpoints')
    p.add_argument('--decoder', default='TurboAE_rate3_cnn')
    p.add_argument('--test_channel_mode', default='block_norm',
                   help='block_norm_ste for TurboAE-binary checkpoints')
    p.add_argument('--channel', default='awgn',
                   help='awgn | t-dist | radar | ... (test channel)')
    p.add_argument('--vv', type=float, default=5.0, help='t-dist dof')
    p.add_argument('--radar_prob', type=float, default=0.05)
    p.add_argument('--radar_power', type=float, default=5.0)
    p.add_argument('--block_len', type=int, default=100,
                   help='must match the training block_len (the interleaver '
                        'permutation depends on it; conv params load either '
                        'way so a mismatch would be SILENTLY wrong)')
    p.add_argument('--dec_num_layer', type=int, default=5)
    p.add_argument('--dtype', default='bfloat16',
                   help='eval forward dtype (heads stay f32; decisions are '
                        'rounded so bf16 matches f32 at the metric level '
                        'within MC noise). float32 for exact legacy parity.')
    p.add_argument('--chunk', type=int, default=50,
                   help='batches fused per device dispatch (lax.scan length)')
    p.add_argument('--legacy_noise', action='store_true',
                   help='reproduce the pre-2022 fixed-noise test bug')
    args = p.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from turboae_tpu.config import Config
    from turboae_tpu.train.trainer import Trainer
    from turboae_tpu.train.checkpoint import load_checkpoint

    cfg = Config(batch_size=args.batch_size, num_block=args.num_block,
                 encoder=args.encoder, decoder=args.decoder,
                 test_channel_mode=args.test_channel_mode,
                 channel=args.channel, vv=args.vv,
                 radar_prob=args.radar_prob, radar_power=args.radar_power,
                 block_len=args.block_len, dec_num_layer=args.dec_num_layer,
                 dtype=args.dtype, legacy_noise=args.legacy_noise,
                 snr_points=args.snr_points,
                 snr_test_start=args.snr_test_start,
                 snr_test_end=args.snr_test_end)
    trainer = Trainer(cfg)
    trainer.params = load_checkpoint(args.ckpt, trainer.params)
    print(f'loaded {args.ckpt}', flush=True)

    interval = (cfg.snr_test_end - cfg.snr_test_start) \
        / max(1, cfg.snr_points - 1)
    snrs = [cfg.snr_test_start + interval * i for i in range(cfg.snr_points)]

    shallow = [s for s in snrs
               if not (args.deep_num_block and s >= args.deep_from_snr)]
    deep = [s for s in snrs if args.deep_num_block and s >= args.deep_from_snr]

    t0 = time.time()
    total_blocks = 0
    per_point = {}
    if shallow:
        r = trainer.sweep(shallow, num_block=args.num_block, chunk=args.chunk)
        for i, s in enumerate(shallow):
            per_point[s] = {k: r[k][i] for k in
                            ('ber', 'bler', 'bit_errors', 'blk_errors')}
            per_point[s]['n_bits'] = r['n_bits']
            per_point[s]['n_blocks'] = r['n_blocks']
        total_blocks += r['n_blocks'] * len(shallow)
    if deep:
        r = trainer.sweep(deep, num_block=args.deep_num_block,
                          chunk=args.chunk)
        for i, s in enumerate(deep):
            per_point[s] = {k: r[k][i] for k in
                            ('ber', 'bler', 'bit_errors', 'blk_errors')}
            per_point[s]['n_bits'] = r['n_bits']
            per_point[s]['n_blocks'] = r['n_blocks']
        total_blocks += r['n_blocks'] * len(deep)
    dt = time.time() - t0
    rate = total_blocks / dt
    print(f'eval: {total_blocks} blocks in {dt:.1f}s ({rate:.0f} blk/s)')

    out = {'snr': snrs,
           'ber': [per_point[s]['ber'] for s in snrs],
           'bler': [per_point[s]['bler'] for s in snrs],
           'bit_errors': [per_point[s]['bit_errors'] for s in snrs],
           'blk_errors': [per_point[s]['blk_errors'] for s in snrs],
           'n_bits': [per_point[s]['n_bits'] for s in snrs],
           'n_blocks': [per_point[s]['n_blocks'] for s in snrs],
           'ber_ci95': [wilson_ci(per_point[s]['bit_errors'],
                                  per_point[s]['n_bits']) for s in snrs],
           'bler_ci95': [wilson_ci(per_point[s]['blk_errors'],
                                   per_point[s]['n_blocks']) for s in snrs],
           'channel': args.channel, 'dtype': args.dtype,
           'legacy_noise': args.legacy_noise,
           'ckpt': args.ckpt, 'eval_blocks_per_s': rate}
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', args.out)
    print('BER', out['ber'])
    print('BLER', out['bler'])


if __name__ == '__main__':
    main()
