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
from .registry import get_model, model_names, param_count
from .srcnn import SRCNN
from .resnet_sr import ResNetSR

__all__ = [
    "AttentionSR",
    "AttentionResidualBlock",
    "Conv",
    "Discriminator",
    "PReLU",
    "ResNetSR",
    "ResidualBlock",
    "SEBlock",
    "SNConv",
    "SNDense",
    "SRCNN",
    "UpsampleBlock",
    "get_model",
    "icnr_kaiming_normal",
    "kaiming_normal",
    "model_names",
    "param_count",
]
