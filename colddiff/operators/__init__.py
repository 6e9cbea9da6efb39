"""Degradation operator registry."""

from .base import Degradation
from .blur import GaussianBlur
from .decolor import Decolorization
from .fade import Fade
from .fade_generation import FadeGeneration
from .fade_naive import FadeNaive
from .noise import Animorphosis, GaussianNoise, Interpolation
from .resolution import Resolution
from .snow import Snow

_REGISTRY = {
    "blur": GaussianBlur,
    "noise": GaussianNoise,
    "mix": Animorphosis,
    "decolor": Decolorization,
    "fade": Fade,
    "fade_naive": FadeNaive,
    "fade_generation": FadeGeneration,
    "resolution": Resolution,
    "snow": Snow,
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
    "Fade",
    "FadeNaive",
    "FadeGeneration",
    "Resolution",
    "Snow",
    "get_operator",
    "register",
]
