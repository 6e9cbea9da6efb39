"""Degradation operator registry."""

from .base import Degradation
from .blur import GaussianBlur
from .decolor import Decolorization
from .noise import Animorphosis, GaussianNoise, Interpolation

_REGISTRY = {
    "blur": GaussianBlur,
    "noise": GaussianNoise,
    "mix": Animorphosis,
    "decolor": Decolorization,
}


def register(name: str, cls) -> None:
    _REGISTRY[name] = cls


def get_operator(name: str, **cfg) -> Degradation:
    """Build a degradation operator by name (e.g. 'blur', 'snow', 'fade')."""
    try:
        cls = _REGISTRY[name]
    except KeyError as e:
        raise ValueError(f"unknown degradation '{name}'; have {sorted(_REGISTRY)}") from e
    return cls.create(**cfg)


__all__ = [
    "Degradation",
    "GaussianBlur",
    "GaussianNoise",
    "Animorphosis",
    "Interpolation",
    "Decolorization",
    "get_operator",
    "register",
]
