"""svcc23_fastsvc_tpu — TPU-native singing voice conversion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lesterphillip/SVCC23_FastSVC (the "harana" package): FastSVC GAN vocoder
training/inference plus the decomposed B02 recipe (Tacotron2-style acoustic
model + HN-uSFGAN vocoder), with feature extraction, data pipeline, and
data-parallel training over a `jax.sharding.Mesh`.

Design stance (not a port):
  * pure-function models over explicit parameter pytrees (init/apply pairs),
  * channels-last (B, T, C) layout everywhere so convs hit the MXU cleanly,
  * a single jitted GAN train step per phase (no Python branching under jit),
  * host-local fixed-shape input pipeline + pjit data parallelism on a Mesh.
"""

__version__ = "0.1.0"
