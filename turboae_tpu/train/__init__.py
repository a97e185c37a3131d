from .trainer import Trainer  # noqa: F401
from .losses import customized_loss  # noqa: F401
from .optimizers import make_optimizer, lookahead  # noqa: F401
