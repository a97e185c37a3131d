from .encoders import make_encoder, ENC_REGISTRY  # noqa: F401
from .decoders import make_decoder, DEC_REGISTRY  # noqa: F401
from .channel_ae import init_ae, forward_ae, make_perms  # noqa: F401
