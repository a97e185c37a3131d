"""CLI surface parity: reference-style flags parse; every registry name
constructs a model."""
import jax
import numpy as np
import pytest

from turboae_tpu.config import get_args, Config, ENCODERS, DECODERS


def test_reference_flag_surface_parses():
    cfg = get_args([
        '-encoder', 'TurboAE_rate3_cnn', '-decoder', 'TurboAE_rate3_cnn',
        '-channel', 'awgn', '-num_epoch', '3', '-num_block', '500',
        '-batch_size', '50', '-block_len', '40',
        '-train_enc_channel_low', '1.0', '-train_enc_channel_high', '1.0',
        '-train_dec_channel_low', '-1.5', '-train_dec_channel_high', '2.0',
        '-enc_num_layer', '2', '-dec_num_layer', '5',
        '-enc_num_unit', '100', '-dec_num_unit', '100',
        '-num_iteration', '6', '-num_iter_ft', '5',
        '-snr_test_start', '-1.5', '-snr_test_end', '4.0', '-snr_points', '12',
        '-loss', 'bce', '-optimizer', 'adam', '-enc_lr', '0.001',
        '-dec_lr', '0.001', '-train_channel_mode', 'block_norm_ste',
        '-enc_clipping', 'both', '-enc_value_limit', '1.0',
        '--is_variable_block_len', '--print_pos_ber',
    ])
    assert cfg.num_epoch == 3
    assert cfg.train_dec_channel_low == -1.5
    assert cfg.train_channel_mode == 'block_norm_ste'
    assert cfg.is_variable_block_len
    assert cfg.print_pos_ber


def test_tpu_native_flags():
    cfg = get_args(['-mesh_shape', '8', '-shard_axis', 'time',
                    '-dtype', 'bfloat16', '--legacy_noise'])
    assert cfg.mesh_shape == (8,)
    assert cfg.shard_axis == 'time'
    assert cfg.dtype == 'bfloat16'
    assert cfg.legacy_noise


SMALL = dict(batch_size=2, block_len=16, enc_num_unit=4, dec_num_unit=4,
             enc_num_layer=1, dec_num_layer=1, num_iteration=2, num_iter_ft=2,
             img_size=4, enc_kernel_size=3, dec_kernel_size=3)


def test_every_reference_encoder_name_constructs():
    from turboae_tpu.models.encoders import make_encoder
    key = jax.random.PRNGKey(0)
    for name in ENCODERS:
        cfg = Config(encoder=name, **SMALL)
        init, apply = make_encoder(cfg)
        params = init(key, cfg)
        assert params is not None or name.startswith('Turbo_rate3'), name


def test_every_reference_decoder_name_constructs():
    from turboae_tpu.models.decoders import make_decoder
    key = jax.random.PRNGKey(0)
    for name in DECODERS:
        cfg = Config(decoder=name, **SMALL)
        init, apply = make_decoder(cfg)
        params = init(key, cfg)
        assert params, name
