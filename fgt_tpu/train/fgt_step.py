"""FGT GAN training step: alternating discriminator/generator update.

Mirrors the reference hot loop (FGT/networks/network.py:86-157):

  1. frozen LAFC-single completes the corrupted flows (no grad);
  2. flows are per-frame signed-max normalized;
  3. D step: hinge on (real frames, composited fake detached);
  4. G step: hinge generator term against the UPDATED discriminator plus
     masked/valid mean-normalized L1.

Spectral-norm power iterations run on every discriminator application in
the D step (torch runs them per forward in train mode). One jitted step
performs both updates; under a dp mesh the batch is sharded on axis 0 and
gradients all-reduce automatically.

Reference quirk preserved: the L1M/L1V weights are SWAPPED between the
masked and valid terms (network.py:150-151) — both default to 1 so the
defaults are unaffected.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from fgt_tpu.train import losses


@dataclasses.dataclass
class FGTLossWeights:
    L1M: float = 1.0
    L1V: float = 1.0
    adv: float = 0.01
    gan_kind: str = "hinge"


class GANTrainState(NamedTuple):
    g_params: Any
    d_params: Any
    d_spectral: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


def norm_flows_nhwc(flows: jnp.ndarray) -> jnp.ndarray:
    """Per (batch, frame, channel) signed-max normalization over space
    (reference network.py:80-84 — NOT abs-max; preserved, except a zero
    max maps to divisor 1 instead of NaN/inf)."""
    b, t, h, w, c = flows.shape
    fmax = jnp.max(flows.reshape(b, t, h * w, c), axis=2)
    fmax = jnp.where(fmax == 0, 1.0, fmax)
    return flows / fmax[:, :, None, None, :]


def make_fgt_train_step(g_apply: Callable, d_apply: Callable,
                        flow_apply: Callable | None,
                        g_tx: optax.GradientTransformation,
                        d_tx: optax.GradientTransformation,
                        weights: FGTLossWeights = FGTLossWeights(),
                        bi_mode: str | None = None,
                        compute_dtype=None, donate: bool = True):
    """Build ``step(state, batch, flow_params) -> (state, metrics)``.

    * g_apply(params, frames, flows, masks) -> filled frames [B,T,H,W,3]
    * d_apply({'params':..., 'spectral':...}, video, sn_update) ->
      (logits, new_spectral)
    * flow_apply(flow_params, flows_2d, masks_2d) -> completed flows or None
      to train on the raw batch flows (tests / precompleted data).

    batch: frames [B,T,H,W,3] in [-1,1], masks [B,T,H,W,1], flows [B,T,H,W,2]
    — or, with ``bi_mode`` set (``flow_direction: bi``, which the reference
    declares but raises NotImplementedError on,
    FGT/networks/network.py:106-107), flows_fwd + flows_bwd instead of
    flows:

    * ``bi_mode='fuse'``: both directions are oracle-completed and fused
      into one velocity estimate (fwd[t] ~ v, bwd[t] ~ -v, so
      (fwd - bwd) / 2), halving single-direction flow noise.
    * ``bi_mode='alternate'``: even steps train on forward flows, odd
      steps on backward — direction augmentation at zero extra compute.
    """
    if bi_mode not in (None, "fuse", "alternate"):
        raise ValueError(f"unknown bi_mode: {bi_mode!r}")

    from fgt_tpu.train.lafc_step import cast_floats

    def run_gen(g_params, frames, flows, masks):
        """Generator forward, optionally in the reduced compute dtype
        (params/opt/losses stay f32 — the big FGT forward+backward is
        where the bytes and MXU time are; the small T-PatchGAN D stays
        f32 so its spectral power-iteration state is unaffected)."""
        if compute_dtype is None:
            return g_apply(g_params, frames, flows, masks)
        out = g_apply(cast_floats(g_params, compute_dtype),
                      frames.astype(compute_dtype),
                      flows.astype(compute_dtype),
                      masks.astype(compute_dtype))
        return out.astype(jnp.float32)

    def complete_flows(flow_params, flows, masks):
        if flow_apply is None:
            return flows
        b, t, h, w, c = flows.shape
        flows2, masks2 = flows.reshape(b * t, h, w, c), \
            masks.reshape(b * t, h, w, 1)
        if compute_dtype is not None:   # frozen oracle: no-grad, cheap cast
            flow_params = cast_floats(flow_params, compute_dtype)
            flows2 = flows2.astype(compute_dtype)
            masks2 = masks2.astype(compute_dtype)
        out = flow_apply(flow_params, flows2, masks2)
        if isinstance(out, tuple):
            out = out[0]
        out = out.astype(jnp.float32)
        return jax.lax.stop_gradient(out.reshape(b, t, h, w, c))

    def d_loss_fn(d_params, d_spectral, real, fake):
        logits_r, spec = d_apply({"params": d_params, "spectral": d_spectral},
                                 real, sn_update=True)
        loss_r = losses.adversarial_loss(logits_r, True, True,
                                         weights.gan_kind)
        logits_f, spec = d_apply({"params": d_params, "spectral": spec},
                                 jax.lax.stop_gradient(fake), sn_update=True)
        loss_f = losses.adversarial_loss(logits_f, False, True,
                                         weights.gan_kind)
        dis_loss = (loss_r + loss_f) / 2.0
        return dis_loss, (spec, loss_r, loss_f)

    def g_head_fn(filled, d_params, d_spectral, frames, masks):
        """Generator loss as a function of the generator OUTPUT: the
        expensive generator forward runs once per step (jax.vjp below)
        and its residuals serve both the D-update fake and the G grad —
        the reference does the same by reusing torch's retained graph
        (network.py:128,142-157)."""
        comp = filled * masks + frames * (1 - masks)
        logits, _ = d_apply({"params": d_params, "spectral": d_spectral},
                            comp, sn_update=False)
        gan = losses.adversarial_loss(logits, True, False, weights.gan_kind)
        l1_valid = losses.l1_normalized(filled, frames, 1 - masks)
        l1_masked = losses.l1_normalized(filled, frames, masks)
        # reference swaps L1M/L1V between the terms (see module docstring)
        gen_loss = (l1_valid * weights.L1M + l1_masked * weights.L1V
                    + gan * weights.adv)
        return gen_loss, (gan, l1_valid, l1_masked)

    # donate the train state (default): params/opt buffers update in place
    # (flow_params is the frozen oracle — reused across steps, never
    # donated). Callers that reuse the pre-step state pass donate=False.
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: GANTrainState, batch, flow_params):
        frames, masks = batch["frames"], batch["masks"]
        if bi_mode == "fuse":
            fwd = complete_flows(flow_params, batch["flows_fwd"], masks)
            bwd = complete_flows(flow_params, batch["flows_bwd"], masks)
            flows = (fwd - bwd) / 2.0
        elif bi_mode == "alternate":
            raw = jnp.where(state.step % 2 == 0,
                            batch["flows_fwd"], batch["flows_bwd"])
            flows = complete_flows(flow_params, raw, masks)
        else:
            flows = complete_flows(flow_params, batch["flows"], masks)
        flows = norm_flows_nhwc(flows)

        # ONE generator forward per step: jax.vjp captures the residuals,
        # the detached output feeds the D update, and the same residuals
        # backprop the G loss against the UPDATED discriminator
        masked_frames = frames * (1 - masks)
        filled, g_vjp = jax.vjp(
            lambda p: run_gen(p, masked_frames, flows, masks),
            state.g_params)
        comp_detached = jax.lax.stop_gradient(
            filled * masks + frames * (1 - masks))

        (dis_loss, (spec, d_real, d_fake)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params, state.d_spectral,
                                     frames, comp_detached)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        (gen_loss, (gan, l1v, l1m)), dfilled = jax.value_and_grad(
            g_head_fn, has_aux=True)(filled, d_params, spec, frames, masks)
        (g_grads,) = g_vjp(dfilled)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        metrics = {"dis_loss": dis_loss, "dis_real": d_real,
                   "dis_fake": d_fake, "gen_loss": gen_loss, "adv": gan,
                   "l1_valid": l1v, "l1_masked": l1m}
        new_state = GANTrainState(g_params, d_params, spec, g_opt, d_opt,
                                  state.step + 1)
        return new_state, metrics

    return step
