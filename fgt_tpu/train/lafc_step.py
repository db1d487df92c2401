"""LAFC / LAFC-single training step (jitted, data-parallel friendly).

Loss recipe from the reference (LAFC/networks/network.py:66-172):
masked+valid L1 on the composited flow, 1st+2nd order smoothness, census
(ternary) loss against the warped shift frame, and the pos/neg-weighted
edge loss ``edgeLoss(filled) + 5*edgeLoss(combined)``; optional global-norm
gradient clipping (max_norm=10).

The step is a pure function of (params, opt_state, batch); under a dp mesh
the batch arrives sharded on axis 0 and XLA inserts the gradient psum.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from fgt_tpu.train import losses


@dataclasses.dataclass
class LAFCLossWeights:
    L1M: float = 1.0
    sm: float = 1.0
    sm2: float = 1.0
    ternary: float = 0.01
    edge: float = 1.0


def cast_floats(tree, dtype):
    """Cast floating leaves of a pytree (params or model inputs) to the
    compute dtype; integer/bool leaves pass through."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)


def make_lafc_train_step(model_apply: Callable, tx: optax.GradientTransformation,
                         weights: LAFCLossWeights = LAFCLossWeights(),
                         compute_dtype=None, donate: bool = True):
    """Returns ``step(params, opt_state, batch) -> (params, opt_state,
    metrics)``. ``batch`` (all NHWC, window axis T=num_flows):

      flows [B,T,H,W,2], diffused_flows [B,T,H,W,2], masks [B,T,H,W,1],
      edges [B,H,W,1], current_frame [B,H,W,3], shift_frame [B,H,W,3]

    ``compute_dtype`` (e.g. jnp.bfloat16) runs the model forward/backward
    in reduced precision while params, optimizer state, and every loss
    reduction stay float32 (standard TPU mixed precision; grads of the
    dtype cast accumulate back to f32).
    """

    def loss_fn(params, batch):
        flows = batch["flows"]
        t = flows.shape[1]
        target_flow = flows[:, t // 2]
        target_mask = batch["masks"][:, t // 2]

        if compute_dtype is not None:
            filled_flow, filled_edge = model_apply(
                cast_floats(params, compute_dtype),
                batch["diffused_flows"].astype(compute_dtype),
                batch["masks"].astype(compute_dtype))
            filled_flow = filled_flow.astype(jnp.float32)
            filled_edge = filled_edge.astype(jnp.float32)
        else:
            filled_flow, filled_edge = model_apply(
                params, batch["diffused_flows"], batch["masks"])

        combined_flow = (target_flow * (1 - target_mask)
                         + filled_flow * target_mask)
        target_edge = batch["edges"]
        combined_edge = (target_edge * (1 - target_mask)
                         + filled_edge * target_mask)
        e_loss = (losses.edge_loss(filled_edge, target_edge)
                  + 5.0 * losses.edge_loss(combined_edge, target_edge))

        l1_masked = losses.l1_normalized(combined_flow, target_flow,
                                         target_mask)
        l1_valid = losses.l1_normalized(filled_flow, target_flow,
                                        1 - target_mask)
        sm1 = losses.smoothness_loss(combined_flow, target_mask)
        sm2 = losses.second_order_loss(combined_flow, target_mask)
        tern = losses.ternary_loss(combined_flow, target_flow, target_mask,
                                   batch["current_frame"],
                                   batch["shift_frame"])
        total = ((l1_masked + l1_valid) * weights.L1M + sm1 * weights.sm
                 + sm2 * weights.sm2 + tern * weights.ternary
                 + e_loss * weights.edge)
        metrics = {"loss": total, "l1_masked": l1_masked,
                   "l1_valid": l1_valid, "sm1": sm1, "sm2": sm2,
                   "ternary": tern, "edge": e_loss}
        return total, metrics

    # donate params+opt (default): the updated pytrees reuse the old
    # buffers in place (no 2x HBM residency across the update). Callers
    # that reuse the pre-step state (equivalence tests) pass donate=False.
    @functools.partial(jax.jit,
                       donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step
