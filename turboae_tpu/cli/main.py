"""CLI entry point — reference-compatible experiment driver.

Mirrors reference main.py:98-260: parse args, build model + optimizers, run
alternating enc/dec training epochs, validate, checkpoint, SNR-sweep test.

Usage (flag surface matches the reference's get_args.py):
    python -m turboae_tpu.cli.main -encoder TurboAE_rate3_cnn \
        -decoder TurboAE_rate3_cnn -num_epoch 10 -num_block 10000
"""
from __future__ import annotations

import os
import sys
import time


def main(argv=None):
    from ..config import get_args
    cfg = get_args(argv)

    # stdout tee to ./logs/<id>_log.txt (reference main.py:17-27,102-107)
    ident = str(int(time.time() % 1_000_000))
    os.makedirs('./logs', exist_ok=True)
    log_path = f'./logs/{ident}_log.txt'

    from ..utils.logging import Tee
    tee = Tee(log_path)
    prev_stdout, sys.stdout = sys.stdout, tee
    try:
        return _run(cfg, ident)
    finally:
        sys.stdout = prev_stdout
        tee.log.close()


def _run(cfg, ident):
    print('[ID]', ident)
    print(cfg)

    from ..utils.logging import MetricsLogger
    metrics = MetricsLogger(cfg.log_jsonl or None)

    from ..dist.mesh import make_mesh
    from ..train.trainer import Trainer
    from ..train.checkpoint import save_checkpoint, load_checkpoint

    mesh = make_mesh(cfg.mesh_shape)
    trainer = Trainer(cfg, mesh=mesh)

    if cfg.init_nw_weight != 'default':
        trainer.params = load_checkpoint(cfg.init_nw_weight, trainer.params)
        print('loaded weights from', cfg.init_nw_weight)

    # alternating training schedule (reference main.py:220-237)
    report_loss, report_ber = [], []
    for epoch in range(1, cfg.num_epoch + 1):
        loss = float('nan')  # stays nan if both phase counts are 0
        if cfg.joint_train:
            loss = trainer.train_epoch(epoch, 'joint')
        else:
            for _ in range(cfg.num_train_enc):
                loss = trainer.train_epoch(epoch, 'encoder')
            for _ in range(cfg.num_train_dec):
                loss = trainer.train_epoch(epoch, 'decoder')
        bce, ber = trainer.validate()
        report_loss.append(bce)
        report_ber.append(ber)
        metrics.log('epoch', epoch=epoch, loss=loss, val_bce=bce, val_ber=ber)

    if cfg.print_test_traj:
        # per-epoch validation trajectory (reference main.py:239-242)
        print('test loss trajectory', report_loss)
        print('test ber trajectory', report_ber)
        print('total epoch', cfg.num_epoch)

    if cfg.num_epoch > 0:
        os.makedirs('./tmp', exist_ok=True)
        ckpt = f'./tmp/model_{ident}.msgpack'
        save_checkpoint(ckpt, trainer.params, trainer.opt_state)
        print('saved model', ckpt)

    snrs, ber, bler = trainer.test()
    metrics.log('test', snrs=snrs, ber=ber, bler=bler)
    metrics.close()

    # variable-block-len: also test at low/high lengths (reference main.py:251-257)
    if cfg.is_variable_block_len:
        from ..train.trainer import Trainer as _T
        for L in (cfg.block_len_low, cfg.block_len_high):
            print(f'====> test at block_len {L}')
            t2 = _T(cfg.replace(block_len=L, is_variable_block_len=False),
                    mesh=mesh)
            t2.params = trainer.params
            t2.test()
    return trainer


if __name__ == '__main__':
    main()
