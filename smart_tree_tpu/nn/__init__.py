from .model import SmartTree
from .norm import MaskedBatchNorm
