"""Model registry.

The reference resolves model classes from YAML type strings via getattr
reflection (/root/reference/harana/bin/train_fastsvc.py:700-717). Here the
registry is an explicit dict of factory callables keyed by the same YAML
names, so reference configs keep working.
"""

from .fastsvc import (  # noqa: F401
    FastSVCGenerator,
    MelGANMultiScaleDiscriminator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
)
from .tacotron2 import Tacotron2, MultiSubFreqDiscriminator  # noqa: F401
from .hnusfgan import HNUSFGANGenerator  # noqa: F401

MODEL_REGISTRY = {
    "FastSVCGenerator": FastSVCGenerator,
    "MelGANMultiScaleDiscriminator": MelGANMultiScaleDiscriminator,
    "HiFiGANMultiScaleMultiPeriodDiscriminator": HiFiGANMultiScaleMultiPeriodDiscriminator,
    # reference YAMLs use "Tacotron2Wrapper" (tacotron2.py:582) — same model
    "Tacotron2": Tacotron2,
    "Tacotron2Wrapper": Tacotron2,
    "MultiSubFreqDiscriminator": MultiSubFreqDiscriminator,
    "HNUSFGANGenerator": HNUSFGANGenerator,
}


def get_model(name: str):
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model type {name!r}; known: {sorted(MODEL_REGISTRY)}"
        ) from None
