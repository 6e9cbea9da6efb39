from .get_model import get_model  # noqa: F401
from .unet_convnext import UnetConvNext  # noqa: F401
from .unet_resnet import UnetResNet  # noqa: F401

__all__ = ["UnetConvNext", "UnetResNet", "get_model"]
