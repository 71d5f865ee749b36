"""DT4Image_Restoration-TPU: a TPU-native (JAX/XLA/Pallas) framework for
Decision-Transformer-guided Plug-and-Play ADMM image restoration (CSMRI).

Re-designed from scratch for TPU hardware with the capabilities of the
PyTorch reference joesharratt1229/DT4Image_Restoration:

  * ``ops``       -- centered orthonormal FFT pair, CSMRI k-space consistency,
                     PSNR/SSIM metrics, image resampling, Pallas TPU kernels.
  * ``models``    -- Flax U-Net plug-in denoiser, Decision Transformer,
                     ARNIQA no-reference IQA scorer.
  * ``env``       -- the PnP-ADMM environment as pure functions + ``lax.scan``.
  * ``inference`` -- greedy RTG-conditioned rollout and PUCB tree search.
  * ``training``  -- optax/AdamW trainer with data-parallel sharding over a
                     ``jax.sharding.Mesh``, orbax checkpoints.
  * ``data``      -- trajectory (json+h5) and evaluation (.mat) pipelines.
  * ``utils``     -- PyTorch checkpoint converters, logging.
"""

__version__ = "0.1.0"
