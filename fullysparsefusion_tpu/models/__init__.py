from .layers import MLP, MaskedBatchNorm, get_activation
