"""TPU-native lipreading / lip-sync / talking-face-generation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``wdas03/lipreading-video-generation`` (see /root/repo/SURVEY.md):

- ``models.vivit``        — ViViT word-level lipreading classifier
  (reference: lipreading/huggingface_vivit_model.py, lipreading/main.py:59-60)
- ``models.generator`` /``models.discriminator`` / ``models.syncnet``
  — Wav2Lip-style audio-conditioned lip-sync GAN
  (reference: gan-model/model/*.py)
- ``models.unet`` / ``models.unet_audio`` / ``models.schedulers``
  — image+audio-conditioned DDPM diffusion
  (reference: video-generation/diffusion/*.py)
- ``ops.audio``           — log-mel frontend as pure XLA (reference:
  gan-model/preprocessing/audio_utils.py)
- ``ops.image``           — batched on-device frame preprocessing
  (reference: lipreading/preprocess.py, gan-model/preprocessing/dataset.py)
- ``ops.attention``       — flash-attention Pallas TPU kernel
- ``parallel.mesh``       — device-mesh / sharding core (the reference has no
  distributed backend; SURVEY.md §2.5)
- ``pipelines``           — train / sample / inference drivers

Everything on the compute path is jit-compiled JAX; samplers are
``lax.scan`` loops; training is data-parallel (optionally model-parallel)
over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
