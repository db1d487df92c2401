"""VFID (video Frechet Inception Distance) with an I3D feature trunk.

The reference paper reports VFID but ships no code for it; the metric's
de-facto standard is Frechet distance between I3D (Inception-v1 3D,
Kinetics-400) Mixed_5c features of real vs generated clips. This module
provides:

* :class:`I3D` — flax reimplementation of the standard `pytorch-i3d`
  InceptionI3d feature trunk (NDHWC);
* :func:`convert_i3d_checkpoint` — torch state_dict -> flax params (the
  pretrained `rgb_imagenet.pt`/Kinetics weights must be supplied by the
  user, like every other pretrained checkpoint in this repo);
* :func:`vfid` / :func:`frechet_distance` — the statistic itself.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Unit3D(nn.Module):
    """Conv3d + BN + ReLU (pytorch-i3d Unit3D)."""

    features: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True

    @nn.compact
    def __call__(self, x):
        # torch-i3d uses 'same'-style padding computed per dim
        pads = [((k - 1) // 2, k // 2) for k in self.kernel]
        x = nn.Conv(self.features, self.kernel, strides=tuple(self.stride),
                    padding=pads, use_bias=not self.use_bn,
                    name="conv3d")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=True, momentum=0.99,
                             epsilon=1e-3, name="bn")(x)
        if self.activation:
            x = nn.relu(x)
        return x


def _maxpool3d(x, kernel, stride):
    pads = [((k - 1) // 2, k // 2) for k in kernel]
    return nn.max_pool(x, tuple(kernel), strides=tuple(stride),
                       padding=pads)


class InceptionBlock(nn.Module):
    """Mixed block: 1x1 | 1x1->3x3 | 1x1->3x3 | pool->1x1."""

    out: Sequence[int]  # [b0, b1a, b1b, b2a, b2b, b3]

    @nn.compact
    def __call__(self, x):
        o = self.out
        b0 = Unit3D(o[0], name="b0")(x)
        b1 = Unit3D(o[1], name="b1a")(x)
        b1 = Unit3D(o[2], (3, 3, 3), name="b1b")(b1)
        b2 = Unit3D(o[3], name="b2a")(x)
        b2 = Unit3D(o[4], (3, 3, 3), name="b2b")(b2)
        b3 = _maxpool3d(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(o[5], name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class I3D(nn.Module):
    """InceptionI3d feature trunk -> [B, 1024] Mixed_5c features.

    Input: [B, T, H, W, 3] video in [-1, 1] (T >= 9, H=W=224 standard;
    any spatial size >= 32 works — features are globally pooled).
    """

    @nn.compact
    def __call__(self, x):
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = _maxpool3d(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = _maxpool3d(x, (1, 3, 3), (1, 2, 2))
        x = InceptionBlock([64, 96, 128, 16, 32, 32], name="Mixed_3b")(x)
        x = InceptionBlock([128, 128, 192, 32, 96, 64], name="Mixed_3c")(x)
        x = _maxpool3d(x, (3, 3, 3), (2, 2, 2))
        x = InceptionBlock([192, 96, 208, 16, 48, 64], name="Mixed_4b")(x)
        x = InceptionBlock([160, 112, 224, 24, 64, 64], name="Mixed_4c")(x)
        x = InceptionBlock([128, 128, 256, 24, 64, 64], name="Mixed_4d")(x)
        x = InceptionBlock([112, 144, 288, 32, 64, 64], name="Mixed_4e")(x)
        x = InceptionBlock([256, 160, 320, 32, 128, 128], name="Mixed_4f")(x)
        x = _maxpool3d(x, (2, 2, 2), (2, 2, 2))
        x = InceptionBlock([256, 160, 320, 32, 128, 128], name="Mixed_5b")(x)
        x = InceptionBlock([384, 192, 384, 48, 128, 128], name="Mixed_5c")(x)
        return jnp.mean(x, axis=(1, 2, 3))  # global avg pool -> [B, 1024]


# ---------------- torch weight conversion ----------------

_BRANCH_MAP = {"b0": "b0", "b1a": "b1a", "b1b": "b1b",
               "b2a": "b2a", "b2b": "b2b", "b3b": "b3b"}
_TORCH_BRANCH = {"b0": "b0", "b1a": "b1a", "b1b": "b1b",
                 "b2a": "b2a", "b2b": "b2b", "b3b": "b3b"}


def convert_i3d_checkpoint(state_dict: dict, template) -> dict:
    """Map a `pytorch-i3d` InceptionI3d state_dict onto :class:`I3D` params.

    torch layout per unit: ``<prefix>.conv3d.weight [O, I, T, H, W]``,
    ``<prefix>.bn.{weight,bias,running_mean,running_var}``. torch branch
    names are ``b0/b1a/b1b/b2a/b2b/b3b`` on recent forks and
    ``branch_0/...`` variants on others; both are accepted.
    """
    import copy

    out = copy.deepcopy(jax.device_get(template))

    def to_np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                          else t)

    def put_unit(params_unit, bstats_unit, prefix):
        w = to_np(state_dict[f"{prefix}.conv3d.weight"])
        params_unit["conv3d"]["kernel"] = w.transpose(2, 3, 4, 1, 0)
        if f"{prefix}.conv3d.bias" in state_dict:
            params_unit["conv3d"]["bias"] = to_np(
                state_dict[f"{prefix}.conv3d.bias"])
        if f"{prefix}.bn.weight" in state_dict:
            params_unit["bn"]["scale"] = to_np(
                state_dict[f"{prefix}.bn.weight"])
            params_unit["bn"]["bias"] = to_np(state_dict[f"{prefix}.bn.bias"])
            bstats_unit["bn"]["mean"] = to_np(
                state_dict[f"{prefix}.bn.running_mean"])
            bstats_unit["bn"]["var"] = to_np(
                state_dict[f"{prefix}.bn.running_var"])

    params = out["params"]
    bstats = out["batch_stats"]
    for name in list(params.keys()):
        if name.startswith("Conv3d"):
            put_unit(params[name], bstats[name], name)
        elif name.startswith("Mixed"):
            for br in _BRANCH_MAP:
                put_unit(params[name][br], bstats[name][br],
                         f"{name}.{_TORCH_BRANCH[br]}")
    return out


# ---------------- the statistic ----------------

def feature_stats(features: np.ndarray):
    mu = features.mean(axis=0)
    cov = np.cov(features, rowvar=False)
    return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(c1 + c2 - 2 sqrt(c1 c2))."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(cov1.dot(cov2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm(
            (cov1 + offset).dot(cov2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(cov1) + np.trace(cov2)
                 - 2 * np.trace(covmean))


class VFIDScorer:
    """Accumulates I3D features for (real, fake) clip pairs, then scores."""

    def __init__(self, variables=None, clip_len: int = 16):
        self.model = I3D()
        self.clip_len = clip_len
        if variables is None:
            dummy = jnp.zeros((1, clip_len, 64, 64, 3))
            variables = jax.jit(self.model.init)(jax.random.PRNGKey(0),
                                                 dummy)
        self.variables = variables
        self._fn = jax.jit(lambda v, x: self.model.apply(v, x))
        self.real: list[np.ndarray] = []
        self.fake: list[np.ndarray] = []

    def _features(self, video: np.ndarray) -> np.ndarray:
        """video: [T, H, W, 3] uint8/float in [0, 255]."""
        v = np.asarray(video, np.float32) / 127.5 - 1.0
        t = v.shape[0]
        starts = list(range(0, max(t - self.clip_len + 1, 1),
                            self.clip_len))
        # cover the tail: a video not a multiple of clip_len gets a final
        # clip ending at the last frame (overlapping the previous clip)
        if t > self.clip_len and starts[-1] + self.clip_len < t:
            starts.append(t - self.clip_len)
        clips = []
        for s in starts:
            clip = v[s:s + self.clip_len]
            if clip.shape[0] < self.clip_len:  # tile short videos
                reps = -(-self.clip_len // clip.shape[0])
                clip = np.concatenate([clip] * reps, 0)[:self.clip_len]
            clips.append(clip)
        feats = self._fn(self.variables, jnp.asarray(np.stack(clips)))
        return np.asarray(feats)

    def update(self, real_video: np.ndarray, fake_video: np.ndarray):
        self.real.append(self._features(real_video))
        self.fake.append(self._features(fake_video))

    def score(self) -> float:
        real = np.concatenate(self.real, 0)
        fake = np.concatenate(self.fake, 0)
        return frechet_distance(*feature_stats(real), *feature_stats(fake))


def vfid(real_videos, fake_videos, variables=None) -> float:
    scorer = VFIDScorer(variables)
    for r, f in zip(real_videos, fake_videos):
        scorer.update(r, f)
    return scorer.score()
