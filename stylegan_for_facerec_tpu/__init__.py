"""stylegan_for_facerec_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
"How to Boost Face Recognition with StyleGAN?" stack (ICCV 2023).

Three-stage pipeline, redesigned TPU-first:
  stage 1: StyleGAN2(-ADA) GAN pretraining on unlabeled face sets,
  stage 2: ReStyle pSp encoder pretraining (GAN inversion),
  stage 3: face-recognition training (IR-SE-50 + ArcFace margin heads),
plus RFW / RB-WebFace verification eval harnesses.

Subpackages: ``nn`` (functional layer core), ``ops`` (Pallas/XLA kernels),
``models`` (backbones, generators, encoders, margin heads), ``losses``,
``data``, ``train``, ``eval``, ``parallel`` (mesh/sharding), ``utils``.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("SGFR_PLATFORM"):
    # Deterministic backend selection for CLIs/tests: some containers
    # force-register a TPU PJRT plugin and override JAX_PLATFORMS from
    # sitecustomize, so plain env vars cannot pin the backend. Setting
    # SGFR_PLATFORM=cpu (or tpu) wins as long as this package is imported
    # before the first jax backend touch — true for every tools/ CLI.
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["SGFR_PLATFORM"])
