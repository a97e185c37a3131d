"""Joint coding+modulation experiment driver (reference main_modulation.py:98-279).

Epoch schedule: num_train_enc x encoder, num_train_dec x decoder,
num_train_mod x mod, num_train_demod x demod (main_modulation.py:254-266).
"""
from __future__ import annotations


def main(argv=None):
    from ..config import get_args
    cfg = get_args(argv)

    from ..dist.mesh import make_mesh
    from ..train.mod_trainer import ModTrainer
    from ..train.checkpoint import save_checkpoint, load_checkpoint

    mesh = make_mesh(cfg.mesh_shape)
    trainer = ModTrainer(cfg, mesh=mesh)
    print(cfg)

    if cfg.init_nw_weight != 'default':
        trainer.params = load_checkpoint(cfg.init_nw_weight, trainer.params)
        print('loaded weights from', cfg.init_nw_weight)

    for epoch in range(1, cfg.num_epoch + 1):
        for _ in range(cfg.num_train_enc):
            trainer.train_epoch(epoch, 'encoder')
        for _ in range(cfg.num_train_dec):
            trainer.train_epoch(epoch, 'decoder')
        for _ in range(cfg.num_train_mod):
            trainer.train_epoch(epoch, 'mod')
        for _ in range(cfg.num_train_demod):
            trainer.train_epoch(epoch, 'demod')

    if cfg.num_epoch > 0:
        import os
        import time
        os.makedirs('./tmp', exist_ok=True)
        ckpt = f'./tmp/mod_model_{int(time.time()) % 1_000_000}.msgpack'
        save_checkpoint(ckpt, trainer.params, trainer.opt_state)
        print('saved model', ckpt)

    trainer.test()
    return trainer


if __name__ == '__main__':
    main()
