"""gan_lib_tensorflow_tpu — a TPU-native GAN training framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the TF1 research
collection ``watsonyanghx/GAN_Lib_Tensorflow``: ACGAN (CIFAR-10), SNGAN with
spectral-norm ResNets + hinge loss (CIFAR-10), SNGAN with projection
discriminator + conditional batch-norm (ImageNet 128), pix2pix (U-Net +
70x70 PatchGAN, cGAN+L1), and PGGAN with progressive growing 4x4 -> 1024x1024.

This is not a port: the TF1 graph/session idioms of the reference are replaced
wholesale by TPU-first designs —

* TF1 variable collections  -> explicit pytree state (``train.state.GANTrainState``)
* per-``sess.run`` host loop -> one fused, jitted n_critic*D + G train step
  (``train.step``) with donated buffers
* spectral-norm ``u`` update collections -> functional power-iteration state in
  a ``'sn'`` flax collection, updated only on D steps (``ops.sn``)
* PGGAN TF1 graph surgery    -> staged-recompile resolution ladder with pytree
  param migration (``models.pggan``, ``train.pggan_loop``)
* feed_dict                  -> double-buffered host->HBM prefetch
  (``data.pipeline``)
* multi-GPU tower averaging  -> ``jax.sharding.Mesh`` + NamedSharding DP/TP,
  XLA collectives over ICI (``parallel``)

Subpackages
-----------
ops       shared layer library (the ``common/``/tflib-lineage equivalent)
models    the five model families
losses    hinge / WGAN-GP / BCE+L1 / AC-GAN auxiliary losses
train     train state, fused step, loop, checkpointing
data      dataset interface + fake/cifar10/paired/multires backends
parallel  mesh construction, sharding rules, device prefetch
eval      Inception-style feature nets, IS/FID, sample grids
utils     scalar logging (plot.py equivalent), image grids, profiling
cli       per-model train/sample entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
