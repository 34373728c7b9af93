"""GAN loss zoo.

Reference loss surface in watsonyanghx/GAN_Lib_Tensorflow:

* hinge (SNGAN/train.py):      L_D = E[relu(1-D(x))] + E[relu(1+D(G(z)))],
                               L_G = -E[D(G(z))]
* WGAN-GP (PGGAN/train.py):    L_D = E[D(G)] - E[D(x)] + 10*GP + eps_drift*E[D(x)^2],
                               GP on x_hat = u*x + (1-u)*G(z)
* cGAN BCE + L1 (pix2pix):     L_D = -E[log D(x,y)] - E[log(1-D(x,G(x)))],
                               L_G = gan_w*(-E[log D(x,G(x))]) + l1_w*|y-G(x)|_1
* AC-GAN auxiliary CE (ACGAN): adversarial + CE(class logits) on real and fake

All functions take **logits** (pre-sigmoid) and reduce with means in float32 —
the pix2pix reference adds EPS inside log(sigmoid(.)); the logits formulation
(softplus) is the numerically stable equivalent. Everything is a pure function
of arrays so it jits, double-differentiates (GP), and shards untouched.
"""

from .adversarial import (
    acgan_aux_loss,
    bce_d_loss,
    bce_g_loss,
    hinge_d_loss,
    hinge_g_loss,
    l1_loss,
    wgan_d_loss,
    wgan_g_loss,
)
from .gradient_penalty import drift_penalty, gradient_penalty

__all__ = [
    "hinge_d_loss", "hinge_g_loss",
    "wgan_d_loss", "wgan_g_loss",
    "bce_d_loss", "bce_g_loss", "l1_loss",
    "acgan_aux_loss",
    "gradient_penalty", "drift_penalty",
]
