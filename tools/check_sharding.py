#!/usr/bin/env python
"""Inspect the compiled HLO of the multi-chip paths for collective traffic.

Multi-chip hardware is not reachable from this host, so 8-chip scaling
cannot be *timed*; what can be *proved* is the communication structure the
compiler actually emitted on an 8-device mesh:

* the data-parallel inference path (sample/batch sharding — how both
  workloads scale, `parallel:` config section) must contain ZERO
  inter-chip collectives → its throughput is chips × per-chip throughput
  modulo host feed;
* the dp×sp×tp sharded train step must contain only the expected
  all-reduce family ops (gradient psums, tp activation reductions).

Prints one JSON line with collective-op counts per path.

Usage: python tools/check_sharding.py  (self-bootstraps an 8-device
virtual CPU mesh like __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import json
import os
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DEV = 8

COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|reduce-scatter|all-to-all|collective-permute)\b"
)


def _count_collectives(hlo_text: str) -> dict:
    counts: dict = {}
    for m in COLLECTIVE_RE.finditer(hlo_text):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def main() -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N_DEV}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
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

    assert len(jax.devices()) >= N_DEV

    out = {}

    # --- data-parallel inference (the workloads' `parallel:` path)
    mesh = make_mesh({"data": N_DEV})
    module = UNet(out_channels=2, base_features=8, depth=2, dtype=jnp.bfloat16)
    x = np.zeros((N_DEV * 2, 64, 64, 1), np.float32)
    params = module.init(jax.random.key(0), jnp.asarray(x[:1]))

    def fwd(params, x):
        return jax.nn.sigmoid(module.apply(params, x))

    xs = jax.device_put(
        x, NamedSharding(mesh, shard_batch_spec(mesh, x.ndim))
    )
    hlo = jax.jit(fwd).lower(params, xs).compile().as_text()
    out["dp_inference_collectives"] = _count_collectives(hlo)

    # --- dp×sp×tp train step
    tmesh = make_mesh({"data": 2, "space": 2, "model": 2})
    clf = ConvClassifier(n_outputs=4, features=(8, 16), dtype=jnp.bfloat16)
    xb = np.zeros((8, 32, 32, 3), np.float32)
    yb = np.zeros((8, 4), np.float32)
    state, opt = create_train_state(
        clf, jax.random.key(0), xb.shape, optimizer=optax.adam(1e-3), mesh=tmesh
    )
    step = make_train_step(clf, opt, loss_fn=bce_loss, mesh=tmesh)
    xbs = jax.device_put(
        xb, NamedSharding(tmesh, shard_batch_spec(tmesh, xb.ndim))
    )
    hlo = step.lower(state, xbs, jnp.asarray(yb)).compile().as_text()
    out["train_step_collectives"] = _count_collectives(hlo)

    ok = not out["dp_inference_collectives"]
    print(json.dumps({"ok": ok, **out}))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
