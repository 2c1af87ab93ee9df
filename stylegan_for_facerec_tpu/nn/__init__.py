from .core import (Ctx, Lambda, Layer, Params, Sequential, State,
                   apply_model, cast_floats, init_child, param_count)
from .layers import (AdaptiveAvgPool2d, AvgPool2d, BatchNorm, BatchNorm1d,
                     BatchNorm2d, Conv2d, Dropout, Flatten, GlobalAvgPool,
                     InstanceNorm2d, LeakyReLU, Linear, MaxPool2d, PReLU,
                     ReLU, Sigmoid, Subsample)
from . import initializers

__all__ = [
    "Ctx", "Lambda", "Layer", "Params", "Sequential", "State", "apply_model",
    "cast_floats", "init_child", "param_count", "AdaptiveAvgPool2d",
    "AvgPool2d", "BatchNorm", "BatchNorm1d", "BatchNorm2d", "Conv2d",
    "Dropout", "Flatten", "GlobalAvgPool", "InstanceNorm2d", "LeakyReLU",
    "Linear", "MaxPool2d", "PReLU", "ReLU", "Sigmoid", "Subsample",
    "initializers",
]
