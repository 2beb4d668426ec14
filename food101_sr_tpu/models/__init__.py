from .attention_sr import AttentionSR
from .discriminator import Discriminator
from .layers import (
    AttentionResidualBlock,
    Conv,
    PReLU,
    ResidualBlock,
    SEBlock,
    SNConv,
    SNDense,
    UpsampleBlock,
    icnr_kaiming_normal,
    kaiming_normal,
)
from .registry import (detect_architecture, get_model, model_for_params,
                       model_names, param_count)
from .rrdb import RRDB, RRDBNet, ResidualDenseBlock
from .srcnn import SRCNN
from .resnet_sr import ResNetSR

__all__ = [
    "AttentionSR",
    "AttentionResidualBlock",
    "Conv",
    "Discriminator",
    "PReLU",
    "RRDB",
    "RRDBNet",
    "ResNetSR",
    "ResidualBlock",
    "ResidualDenseBlock",
    "SEBlock",
    "SNConv",
    "SNDense",
    "SRCNN",
    "UpsampleBlock",
    "detect_architecture",
    "get_model",
    "model_for_params",
    "icnr_kaiming_normal",
    "kaiming_normal",
    "model_names",
    "param_count",
]
