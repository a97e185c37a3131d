"""DeepTurbo: train a neural iterative decoder over the FIXED classical
Turbo-757 encoder (reference README 'DeepTurbo' configuration:
-encoder Turbo_rate3_757 -decoder TurboAE_rate3_cnn).

Run (small smoke): python examples/deepturbo.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from turboae_tpu.cli.main import main

if __name__ == '__main__':
    main(['-encoder', 'Turbo_rate3_757', '-decoder', 'TurboAE_rate3_cnn',
          '-num_epoch', '2', '-num_block', '2000', '-batch_size', '200',
          '-num_train_enc', '0', '-num_train_dec', '5',
          '-snr_points', '4'] + sys.argv[1:])
