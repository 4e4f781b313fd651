"""Sharded training for the model zoo (the capability the reference lacks).

The reference ships inference-only TorchScript models; this framework also
trains them natively on TPU meshes:

* segmentation: sigmoid BCE + soft-Dice loss over mask channels,
* classification: sigmoid BCE over taxonomy-node targets,
* the jitted train step runs under dp (batch over ``data``), optional sp
  (image rows over ``space`` — XLA inserts conv halo exchanges) and tp
  (wide channels over ``model``) shardings; gradients reduce over the mesh
  through XLA-inserted collectives on ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..parallel.mesh import shard_batch_spec, shard_params

__all__ = [
    "bce_dice_loss",
    "bce_loss",
    "create_train_state",
    "make_train_step",
    "TrainState",
]


class TrainState:
    """Minimal train state: params + optimizer state + step counter."""

    def __init__(self, params, opt_state, step):
        self.params = params
        self.opt_state = opt_state
        self.step = step

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def bce_dice_loss(logits: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid BCE + soft Dice, averaged over batch and channels."""
    masks = masks.astype(jnp.float32)
    bce = optax.sigmoid_binary_cross_entropy(logits, masks).mean()
    probs = jax.nn.sigmoid(logits)
    axes = tuple(range(1, logits.ndim - 1))
    inter = jnp.sum(probs * masks, axis=axes)
    union = jnp.sum(probs, axis=axes) + jnp.sum(masks, axis=axes)
    dice = 1.0 - (2 * inter + 1.0) / (union + 1.0)
    return bce + dice.mean()


def bce_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return optax.sigmoid_binary_cross_entropy(logits, targets.astype(jnp.float32)).mean()


def create_train_state(
    module,
    rng: jax.Array,
    input_shape: Tuple[int, ...],
    optimizer: Optional[optax.GradientTransformation] = None,
    learning_rate: float = 1e-3,
    mesh: Optional[Mesh] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """Initialize params (+optionally shard them on a mesh) and opt state."""
    if optimizer is None:
        optimizer = optax.adamw(learning_rate)
    params = module.init(rng, jnp.zeros(input_shape, jnp.float32))
    if mesh is not None:
        params = shard_params(params, mesh)
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32)), optimizer


def make_train_step(
    module,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable = bce_dice_loss,
    mesh: Optional[Mesh] = None,
    jit: bool = True,
) -> Callable:
    """Build the (sharded) train step: (state, images, targets) → (state, metrics).

    ``jit=False`` returns the raw traceable function, for callers that
    embed the step in a larger jitted program (e.g. the bench harness's
    in-jit timing loop)."""

    def step(state: TrainState, images: jnp.ndarray, targets: jnp.ndarray):
        if mesh is not None:
            spec = shard_batch_spec(mesh, images.ndim)
            images = jax.lax.with_sharding_constraint(
                images, NamedSharding(mesh, spec)
            )

        def loss_of(params):
            logits = module.apply(params, images)
            return loss_fn(logits, targets)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        return new_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,)) if jit else step
