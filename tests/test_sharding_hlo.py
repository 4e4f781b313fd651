"""Multi-chip communication structure, proved from compiled HLO.

Real multi-chip hardware is not reachable from this host; what CAN be
asserted in CI is the collective traffic the compiler emits on the virtual
8-device mesh (the same evidence tools/check_sharding.py prints):

* data-parallel inference (the workloads' ``parallel:`` scaling path) must
  contain ZERO inter-chip collectives — chips scale throughput linearly
  modulo host feed;
* the dp×sp×tp train step must contain the expected all-reduce family
  (gradient psums / tp activation reductions) and nothing exotic.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding

from maze_image_processing_pipeline_tpu.models import ConvClassifier, UNet
from maze_image_processing_pipeline_tpu.models.train import (
    bce_loss,
    create_train_state,
    make_train_step,
)
from maze_image_processing_pipeline_tpu.parallel.mesh import (
    make_mesh,
    shard_batch_spec,
)

N_DEV = 8

COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|reduce-scatter|all-to-all|collective-permute)\b"
)


def count_collectives(hlo_text: str) -> dict:
    counts: dict = {}
    for m in COLLECTIVE_RE.finditer(hlo_text):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs the 8-device virtual mesh (tests/conftest.py)")


def test_dp_inference_hlo_has_zero_collectives(eight_devices):
    mesh = make_mesh({"data": N_DEV})
    module = UNet(out_channels=2, base_features=8, depth=2, dtype=jnp.bfloat16)
    x = np.zeros((N_DEV * 2, 64, 64, 1), np.float32)
    params = module.init(jax.random.key(0), jnp.asarray(x[:1]))

    def fwd(params, x):
        return jax.nn.sigmoid(module.apply(params, x))

    xs = jax.device_put(x, NamedSharding(mesh, shard_batch_spec(mesh, x.ndim)))
    hlo = jax.jit(fwd).lower(params, xs).compile().as_text()
    assert count_collectives(hlo) == {}


def test_device_tiled_inference_forward_hlo_has_zero_collectives(eight_devices):
    """DeviceTiledInference's mesh mode shards tile chunks over 'data' with
    shard_params-replicated weights: its forward step must also be
    collective-free (chips scale tile throughput linearly)."""
    from maze_image_processing_pipeline_tpu.models.inference import (
        default_device_pre,
        sigmoid_post,
    )
    from maze_image_processing_pipeline_tpu.parallel.mesh import shard_params

    mesh = make_mesh({"data": N_DEV})
    module = UNet(out_channels=2, base_features=8, depth=1, dtype=jnp.bfloat16)
    tiles = np.zeros((N_DEV * 2, 64, 64), np.uint8)
    params = module.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    params = shard_params(params, mesh)

    def step(params, tiles):
        y = sigmoid_post(module.apply(params, default_device_pre(tiles)))
        return y.astype(jnp.float32)

    ts = jax.device_put(
        tiles, NamedSharding(mesh, shard_batch_spec(mesh, tiles.ndim))
    )
    hlo = jax.jit(step).lower(params, ts).compile().as_text()
    assert count_collectives(hlo) == {}


def test_train_step_hlo_has_expected_collectives(eight_devices):
    tmesh = make_mesh({"data": 2, "space": 2, "model": 2})
    clf = ConvClassifier(n_outputs=4, features=(8, 16), dtype=jnp.bfloat16)
    xb = np.zeros((8, 32, 32, 3), np.float32)
    yb = np.zeros((8, 4), np.float32)
    state, opt = create_train_state(
        clf, jax.random.key(0), xb.shape, optimizer=optax.adam(1e-3), mesh=tmesh
    )
    step = make_train_step(clf, opt, loss_fn=bce_loss, mesh=tmesh)
    xbs = jax.device_put(xb, NamedSharding(tmesh, shard_batch_spec(tmesh, xb.ndim)))
    hlo = step.lower(state, xbs, jnp.asarray(yb)).compile().as_text()
    counts = count_collectives(hlo)
    # Gradient/activation reductions must exist; nothing beyond the
    # all-reduce family + resharding gathers/permutes is expected.
    assert counts.get("all-reduce", 0) > 0
    assert set(counts) <= {
        "all-reduce",
        "all-gather",
        "reduce-scatter",
        "collective-permute",
    }
