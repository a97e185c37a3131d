"""FTAE experiment driver (reference ftae_main.py:28-125)."""
from __future__ import annotations


def main(argv=None):
    from ..config import get_args
    cfg = get_args(argv)

    from ..dist.mesh import make_mesh
    from ..train.ftae_trainer import FTAETrainer
    from ..train.checkpoint import save_checkpoint, load_checkpoint

    mesh = make_mesh(cfg.mesh_shape)
    trainer = FTAETrainer(cfg, mesh=mesh)
    print(cfg)

    if cfg.init_nw_weight != 'default':
        trainer.params = load_checkpoint(cfg.init_nw_weight, trainer.params)
        print('loaded weights from', cfg.init_nw_weight)

    for epoch in range(1, cfg.num_epoch + 1):
        for _ in range(cfg.num_train_enc):
            trainer.train_epoch(epoch, 'encoder')
        for _ in range(cfg.num_train_dec):
            trainer.train_epoch(epoch, 'decoder')

    if cfg.num_epoch > 0:
        import os
        import time
        os.makedirs('./tmp', exist_ok=True)
        ckpt = f'./tmp/ftae_model_{int(time.time()) % 1_000_000}.msgpack'
        save_checkpoint(ckpt, trainer.params, trainer.opt_state)
        print('saved model', ckpt)

    trainer.test()
    return trainer


if __name__ == '__main__':
    main()
