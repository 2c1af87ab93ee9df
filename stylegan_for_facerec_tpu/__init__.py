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
