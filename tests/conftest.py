"""Test harness config.

Forces JAX onto a virtual 8-device CPU backend (the standard fake-backend
trick) so sharding tests run anywhere, and makes the reference PyTorch
package importable as a parity oracle with its unavailable DSP deps stubbed.
"""

import os
import sys
import types

# The session env pre-sets JAX_PLATFORMS=axon (a remote TPU tunnel whose
# per-program compiles take minutes) and a sitecustomize hook re-forces it
# at interpreter start, so the env var alone is not enough — override the
# live jax config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Keep matmuls in strict f32 on CPU for parity comparisons.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def make_reference_importable():
    """Put /root/reference on sys.path with missing DSP libs stubbed.

    Returns True if the reference tree is present (skip parity tests if not).
    """
    ref = "/root/reference"
    if not os.path.isdir(ref):
        return False
    for name in ("librosa", "librosa.util", "pyworld", "pysptk", "soundfile", "kaldiio", "speechbrain"):
        _stub(name)
    ta = _stub("torchaudio")
    taf = _stub("torchaudio.functional", spectrogram=None)
    ta.functional = taf
    if ref not in sys.path:
        sys.path.insert(0, ref)
    return True
