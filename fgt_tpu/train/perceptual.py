"""VGG19 perceptual + style (gram) losses.

Reference: LAFC/models/utils/flow_losses.py:128-310 and
FGT/models/utils/loss.py:143-213 — defined and available but not in the
default loss mix; same here. The feature trunk is a flax VGG19 (through
relu5_1, the five feature taps the reference uses); pretrained torchvision
weights are user-supplied and converted with
:func:`convert_vgg19_checkpoint`.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision vgg19.features conv layout: conv indices per block
_CFG = [(2, 64), (2, 128), (4, 256), (4, 512), (4, 512)]
# reference taps: relu1_1 .. relu5_1 with weights 1/32, 1/16, 1/8, 1/4, 1
TAP_WEIGHTS = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG19Features(nn.Module):
    """Returns the [relu1_1 .. relu5_1] feature maps of an NHWC image in
    [0, 1] (ImageNet-normalized internally, like the reference)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        x = (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
        taps = []
        conv_i = 0
        for block, (n_convs, width) in enumerate(_CFG):
            for ci in range(n_convs):
                x = nn.Conv(width, (3, 3), padding=1,
                            name=f"conv{conv_i}")(x)
                x = nn.relu(x)
                if ci == 0:
                    taps.append(x)          # reluN_1
                conv_i += 1
            if block < len(_CFG) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def convert_vgg19_checkpoint(state_dict: dict, template) -> dict:
    """torchvision ``vgg19(weights=...).features.state_dict()`` -> params.

    torch keys are ``<idx>.weight/<idx>.bias`` over the Sequential; conv
    indices in order are mapped onto conv0..conv15.
    """
    import copy

    out = copy.deepcopy(jax.device_get(template))
    torch_conv_ids = sorted(
        {int(k.split(".")[0]) for k in state_dict if k.endswith(".weight")})

    def to_np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                          else t)

    for i, tid in enumerate(torch_conv_ids):
        w = to_np(state_dict[f"{tid}.weight"])      # [O, I, H, W]
        out["params"][f"conv{i}"]["kernel"] = w.transpose(2, 3, 1, 0)
        out["params"][f"conv{i}"]["bias"] = to_np(state_dict[f"{tid}.bias"])
    return out


def _gram(feat: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = feat.shape
    f = feat.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f) / (h * w * c)


def perceptual_loss(vgg_apply, vgg_params, pred: jnp.ndarray,
                    target: jnp.ndarray,
                    weights: Sequence[float] = TAP_WEIGHTS) -> jnp.ndarray:
    """Weighted feature L1 (reference loss.py:178-189). Inputs in [0, 1]."""
    fp = vgg_apply(vgg_params, pred)
    ft = vgg_apply(vgg_params, jax.lax.stop_gradient(target))
    total = 0.0
    for w, a, b in zip(weights, fp, ft):
        total = total + w * jnp.mean(jnp.abs(a - b))
    return total


def style_loss(vgg_apply, vgg_params, pred: jnp.ndarray,
               target: jnp.ndarray) -> jnp.ndarray:
    """Gram-matrix L1 over the same taps (reference loss.py:191-213)."""
    fp = vgg_apply(vgg_params, pred)
    ft = vgg_apply(vgg_params, jax.lax.stop_gradient(target))
    total = 0.0
    for a, b in zip(fp, ft):
        total = total + jnp.mean(jnp.abs(_gram(a) - _gram(b)))
    return total
