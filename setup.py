#!/usr/bin/env python3
"""Install script for svcc23_fastsvc_tpu.

Console scripts mirror the reference's harana-* entry points
(/root/reference/setup.py:60-76) under the svc-tpu-* prefix.
"""

from setuptools import find_packages, setup

setup(
    name="svcc23_fastsvc_tpu",
    version="0.1.0",
    description="TPU-native singing voice conversion (FastSVC + B02)",
    packages=find_packages(include=["svcc23_fastsvc_tpu*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "numpy",
        "scipy",
        "h5py",
        "pyyaml",
        "joblib",
    ],
    extras_require={
        "test": ["pytest", "torch"],
        "logging": ["tensorboardX"],
    },
    entry_points={
        "console_scripts": [
            "svc-tpu-extract-speakers=svcc23_fastsvc_tpu.bin.extract_spk_embs:main",
            "svc-tpu-preprocess=svcc23_fastsvc_tpu.bin.preprocess_fastsvc:main",
            "svc-tpu-preprocess-b02=svcc23_fastsvc_tpu.bin.preprocess_b02:main",
            "svc-tpu-compute-statistics=svcc23_fastsvc_tpu.bin.compute_statistics_fastsvc:main",
            "svc-tpu-compute-statistics-b02=svcc23_fastsvc_tpu.bin.compute_statistics_b02:main",
            "svc-tpu-compute-f0stats=svcc23_fastsvc_tpu.bin.compute_f0stats:main",
            "svc-tpu-normalize=svcc23_fastsvc_tpu.bin.normalize_fastsvc:main",
            "svc-tpu-normalize-b02=svcc23_fastsvc_tpu.bin.normalize_b02:main",
            "svc-tpu-train-fastsvc=svcc23_fastsvc_tpu.bin.train_fastsvc:main",
            "svc-tpu-train-b02=svcc23_fastsvc_tpu.bin.train_b02:main",
            "svc-tpu-decode-fastsvc=svcc23_fastsvc_tpu.bin.decode_fastsvc:main",
            "svc-tpu-decode-b02=svcc23_fastsvc_tpu.bin.decode_b02:main",
            "svc-tpu-synthesize-b02=svcc23_fastsvc_tpu.bin.synthesize_b02:main",
            "svc-tpu-convert-checkpoint=svcc23_fastsvc_tpu.bin.convert_checkpoint:main",
            "svc-tpu-evaluate=svcc23_fastsvc_tpu.bin.evaluate:main",
            "svc-tpu-split-train-dev=svcc23_fastsvc_tpu.bin.split_train_dev:main",
        ],
    },
)
