"""Training loop with checkpoint/resume (orbax).

The reference ships inference-only models and resumes only at sample
granularity (``skip_existing``). The TPU framework adds real training with
step-granular checkpoint/resume: the loop restores the latest orbax
checkpoint on start and saves every ``checkpoint_every`` steps, so a
preempted TPU job continues where it stopped.
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..progress import ProgressLogger
from .train import TrainState, bce_dice_loss, create_train_state, make_train_step

logger = logging.getLogger(__name__)

__all__ = ["fit", "save_checkpoint", "restore_checkpoint"]


def _manager(checkpoint_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(checkpoint_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_checkpoint(checkpoint_dir: str, state: TrainState, step: int) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(checkpoint_dir)
    mgr.save(
        step,
        args=ocp.args.StandardSave(
            {"params": state.params, "opt_state": state.opt_state}
        ),
    )
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(
    checkpoint_dir: str, state: TrainState
) -> Tuple[TrainState, int]:
    """Restore the latest checkpoint into ``state``; returns (state, step)."""
    import orbax.checkpoint as ocp

    mgr = _manager(checkpoint_dir)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return state, 0
    restored = mgr.restore(
        step,
        args=ocp.args.StandardRestore(
            {"params": state.params, "opt_state": state.opt_state}
        ),
    )
    mgr.close()
    new_state = TrainState(
        restored["params"], restored["opt_state"], jnp.asarray(step, jnp.int32)
    )
    logger.info("Restored checkpoint step %d from %s", step, checkpoint_dir)
    return new_state, int(step)


def fit(
    module,
    data_iter: Iterator[Tuple[np.ndarray, np.ndarray]],
    n_steps: int,
    *,
    learning_rate: float = 1e-3,
    input_shape: Tuple[int, ...],
    loss_fn: Callable = bce_dice_loss,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 100,
    log_interval: float = 30,
    seed: int = 0,
) -> TrainState:
    """Train ``module`` on (images, targets) batches with checkpoint/resume."""
    optimizer = optax.adamw(learning_rate)
    state, optimizer = create_train_state(
        module,
        jax.random.key(seed),
        input_shape,
        optimizer=optimizer,
        mesh=mesh,
    )
    start_step = 0
    if checkpoint_dir is not None:
        state, start_step = restore_checkpoint(checkpoint_dir, state)

    step_fn = make_train_step(module, optimizer, loss_fn=loss_fn, mesh=mesh)
    progress = ProgressLogger(
        description="train", n_total=n_steps, log_interval=log_interval, unit="step"
    )

    for step in range(start_step, n_steps):
        images, targets = next(data_iter)
        state, metrics = step_fn(state, images, targets)
        progress.update()
        if (
            checkpoint_dir is not None
            and checkpoint_every
            and (step + 1) % checkpoint_every == 0
        ):
            save_checkpoint(checkpoint_dir, state, step + 1)

    if checkpoint_dir is not None:
        save_checkpoint(checkpoint_dir, state, n_steps)
    logger.info("Training finished at step %d (loss %.4f)", n_steps, float(metrics["loss"]))
    return state
