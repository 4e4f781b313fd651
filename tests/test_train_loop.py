import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from maze_image_processing_pipeline_tpu.models import UNet
from maze_image_processing_pipeline_tpu.models.train_loop import (
    fit,
    restore_checkpoint,
)


def data_gen(rng):
    while True:
        x = rng.random((2, 32, 32, 3)).astype(np.float32)
        y = (x.mean(axis=-1, keepdims=True) > 0.5).astype(np.float32)
        yield x, y


def test_fit_and_resume(tmp_path, rng):
    module = UNet(out_channels=1, base_features=4, depth=1, dtype=jnp.float32)
    ckpt = str(tmp_path / "ckpt")

    state = fit(
        module,
        data_gen(rng),
        n_steps=4,
        input_shape=(2, 32, 32, 3),
        checkpoint_dir=ckpt,
        checkpoint_every=2,
        log_interval=1e9,
    )
    assert int(state.step) == 4

    # Resuming continues from the saved step (no restart from 0).
    state2 = fit(
        module,
        data_gen(rng),
        n_steps=6,
        input_shape=(2, 32, 32, 3),
        checkpoint_dir=ckpt,
        checkpoint_every=100,
        log_interval=1e9,
    )
    assert int(state2.step) == 6

    from maze_image_processing_pipeline_tpu.models.train import create_train_state

    fresh, _ = create_train_state(module, __import__("jax").random.key(0), (2, 32, 32, 3))
    restored, step = restore_checkpoint(ckpt, fresh)
    assert step == 6
    # Restored params differ from the fresh init (training happened).
    leaf_fresh = np.asarray(
        __import__("jax").tree.leaves(fresh.params)[0]
    )
    leaf_restored = np.asarray(__import__("jax").tree.leaves(restored.params)[0])
    assert not np.allclose(leaf_fresh, leaf_restored)
