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

# Persistent compile cache: the suite compiles hundreds of small CPU
# executables; caching them across runs cuts wall time severalfold.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".pytest_cache", "jax_cache",
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
# Keep matmuls in strict f32 on CPU for parity comparisons.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec on the stub (e.g.
    # transformers' is_librosa_available check) doesn't raise
    import importlib.machinery

    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
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
    for name in ("pyworld", "pysptk", "soundfile", "kaldiio", "speechbrain", "humanfriendly"):
        _stub(name)
    ta = _stub("torchaudio")
    taf = _stub("torchaudio.functional", spectrogram=None)
    ta.functional = taf

    # librosa stub: LogMel only needs filters.mel — delegate to our own
    # filterbank implementation (shared matrix; the conformer parity test
    # then genuinely exercises stft/mvn/encoder numerics).
    if "librosa" not in sys.modules:
        import numpy as _np

        def _mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, htk=False, norm=1):
            from svcc23_fastsvc_tpu.ops.stft import mel_filterbank

            fb = mel_filterbank(
                sr, n_fft, n_mels, fmin, fmax, htk=htk,
                norm="slaney" if norm in (1, "slaney") else None,
            )
            return _np.asarray(fb).T  # librosa returns (n_mels, n_freqs)

        lb = _stub("librosa")
        lb.filters = _stub("librosa.filters", mel=_mel)
        _stub("librosa.util")

    # torch_complex stub: frontend only builds ComplexTensor(real, imag)
    # and reads .real/.imag/.dim()
    if "torch_complex" not in sys.modules:
        class _ComplexTensor:
            def __init__(self, real, imag):
                self.real, self.imag = real, imag

            def dim(self):
                return self.real.dim()

        tc = _stub("torch_complex")
        tct = _stub("torch_complex.tensor", ComplexTensor=_ComplexTensor)
        tc.tensor = tct
        tc.ComplexTensor = _ComplexTensor

    # espnet stub: subsampling.py imports PositionalEncoding only as the
    # default pos_enc for subsampling variants the no-subsample config never
    # instantiates — a placeholder class is enough.
    if "espnet" not in sys.modules:
        class _PEPlaceholder:  # pragma: no cover
            def __init__(self, *a, **k):
                raise RuntimeError("espnet PositionalEncoding stub used")

        _stub("espnet")
        _stub("espnet.nets")
        _stub("espnet.nets.pytorch_backend")
        _stub("espnet.nets.pytorch_backend.transformer")
        _stub(
            "espnet.nets.pytorch_backend.transformer.embedding",
            PositionalEncoding=_PEPlaceholder,
        )

    # torch>=2 requires return_complex for real-input stft; the reference
    # was written against torch 1.12 and omits it. Shim the legacy call.
    import torch as _torch

    if not getattr(_torch.stft, "_legacy_shim", False):
        _orig_stft = _torch.stft

        def _stft_compat(*a, **k):
            if "return_complex" not in k:
                k["return_complex"] = True
                return _torch.view_as_real(_orig_stft(*a, **k))
            return _orig_stft(*a, **k)

        _stft_compat._legacy_shim = True
        _torch.stft = _stft_compat

    if ref not in sys.path:
        sys.path.insert(0, ref)
    return True
