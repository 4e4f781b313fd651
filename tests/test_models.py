import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maze_image_processing_pipeline_tpu.engine import BatchedPipeline, Call, Pipeline, Unpack
from maze_image_processing_pipeline_tpu.models import (
    ConvClassifier,
    JaxInference,
    LoadedModel,
    UNet,
    load_model,
    save_model,
)
from maze_image_processing_pipeline_tpu.models.train import (
    bce_dice_loss,
    bce_loss,
    create_train_state,
    make_train_step,
)
from maze_image_processing_pipeline_tpu.parallel import make_mesh, shard_batch_spec


@pytest.fixture(scope="module")
def tiny_unet():
    module = UNet(out_channels=2, base_features=4, depth=2, dtype=jnp.float32)
    params = module.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    return LoadedModel(module, params, {"outputs": {"pred": {"channel_names": ["a", "b"]}}})


class TestUNet:
    def test_shapes(self, tiny_unet):
        x = jnp.zeros((2, 64, 64, 3))
        y = tiny_unet(x)
        assert y.shape == (2, 64, 64, 2)
        assert y.dtype == jnp.float32

    def test_bf16_variant(self):
        module = UNet(out_channels=1, base_features=4, depth=1, dtype=jnp.bfloat16)
        params = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        y = module.apply(params, jnp.zeros((1, 32, 32, 3)))
        assert y.dtype == jnp.float32  # head casts back


class TestClassifier:
    def test_shapes(self):
        module = ConvClassifier(n_outputs=7, features=(4, 8), dtype=jnp.float32)
        params = module.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        y = module.apply(params, jnp.zeros((3, 64, 64, 3)))
        assert y.shape == (3, 7)


class TestModelIO:
    def test_save_load_roundtrip(self, tmp_path, tiny_unet):
        model_dir = str(tmp_path / "model")
        save_model(
            model_dir,
            tiny_unet.module,
            tiny_unet.params,
            outputs={"pred": {"channel_names": ["a", "b"]}},
        )
        loaded = load_model(model_dir)
        assert loaded.output_channel_names == ["a", "b"]

        x = jnp.ones((1, 32, 32, 3))
        np.testing.assert_allclose(
            np.asarray(tiny_unet(x)), np.asarray(loaded(x)), atol=1e-5
        )

    def test_load_with_dtype_override(self, tmp_path, tiny_unet):
        model_dir = str(tmp_path / "model")
        save_model(model_dir, tiny_unet.module, tiny_unet.params)
        loaded = load_model(model_dir, dtype="bfloat16")
        assert loaded.module.dtype == jnp.bfloat16


class TestJaxInference:
    def test_single_stream(self, tiny_unet, rng):
        images = [(rng.random((64, 64)) * 255).astype(np.uint8) for _ in range(5)]

        with Pipeline() as p:
            img = Unpack(images)
            pred = JaxInference(tiny_unet, img, batch_size=2)

        objs = p.run()
        assert len(objs) == 5
        out = objs[0][pred]
        assert out.shape == (64, 64, 2)
        assert 0.0 <= out.min() and out.max() <= 1.0  # sigmoid applied

        # Batched dispatch must equal per-item dispatch.
        with Pipeline() as p1:
            img1 = Unpack(images)
            pred1 = JaxInference(tiny_unet, img1, batch_size=None)
        objs1 = p1.run()
        for a, b in zip(objs, objs1):
            np.testing.assert_allclose(a[pred], b[pred1], atol=2e-5)

    def test_with_batched_pipeline(self, tiny_unet, rng):
        images = [(rng.random((64, 64)) * 255).astype(np.uint8) for _ in range(5)]

        with Pipeline() as p:
            img = Unpack(images)
            with BatchedPipeline(2):
                pred = JaxInference(tiny_unet, img, is_batch=True)

        objs = p.run()
        assert len(objs) == 5
        assert objs[0][pred].shape == (64, 64, 2)

    def test_is_batch_tail_pads_instead_of_recompiling(self, tiny_unet, rng):
        """The last partial BatchedPipeline group must pad to the learned
        bucket size, not introduce a new compiled shape."""
        images = [(rng.random((32, 32)) * 255).astype(np.uint8) for _ in range(7)]
        shapes_seen = []

        with Pipeline() as p:
            img = Unpack(images)
            with BatchedPipeline(4):
                pred = JaxInference(tiny_unet, img, is_batch=True)
                node = pred.node
                inner_step = node._step
                node._step = lambda p, x: shapes_seen.append(x.shape) or inner_step(p, x)

        objs = p.run()
        assert len(objs) == 7
        # Two dispatches (4 + 3→padded to 4), one shape.
        assert shapes_seen == [(4, 32, 32), (4, 32, 32)]


class TestTraining:
    def test_train_step_reduces_loss(self):
        module = UNet(out_channels=1, base_features=4, depth=1, dtype=jnp.float32)
        state, opt = create_train_state(module, jax.random.key(0), (2, 32, 32, 3))
        step = make_train_step(module, opt)

        rng = np.random.default_rng(0)
        x = rng.random((2, 32, 32, 3)).astype(np.float32)
        y = (rng.random((2, 32, 32, 1)) > 0.5).astype(np.float32)

        losses = []
        for _ in range(5):
            state, metrics = step(state, x, y)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]

    def test_train_step_sharded_mesh(self):
        # dp+sp+tp mesh on the 8 virtual CPU devices.
        mesh = make_mesh({"data": 2, "space": 2, "model": 2})
        module = UNet(out_channels=1, base_features=64, depth=1, dtype=jnp.float32)
        state, opt = create_train_state(
            module, jax.random.key(0), (2, 32, 32, 3), mesh=mesh
        )
        step = make_train_step(module, opt, mesh=mesh)

        rng = np.random.default_rng(0)
        x = rng.random((4, 32, 32, 3)).astype(np.float32)
        y = (rng.random((4, 32, 32, 1)) > 0.5).astype(np.float32)
        state, metrics = step(state, x, y)
        assert np.isfinite(float(metrics["loss"]))

        # Result must match the unsharded step.
        state0, opt0 = create_train_state(module, jax.random.key(0), (2, 32, 32, 3))
        step0 = make_train_step(module, opt0)
        state0, metrics0 = step0(state0, x, y)
        np.testing.assert_allclose(
            float(metrics["loss"]), float(metrics0["loss"]), rtol=1e-4
        )

    def test_classifier_training(self):
        module = ConvClassifier(n_outputs=4, features=(4, 8), dtype=jnp.float32)
        state, opt = create_train_state(module, jax.random.key(1), (2, 32, 32, 3))
        step = make_train_step(module, opt, loss_fn=bce_loss)
        rng = np.random.default_rng(1)
        x = rng.random((4, 32, 32, 3)).astype(np.float32)
        y = (rng.random((4, 4)) > 0.5).astype(np.float32)
        state, m = step(state, x, y)
        assert np.isfinite(float(m["loss"]))


def test_lane_preserving_groupnorm_matches_flax():
    """models.layers.GroupNorm is a drop-in for nn.GroupNorm (same params,
    same numerics): flax's reshape-based version splits the TPU lane dim
    (measured 37 of 56 ms of a U-Net 1024^2-tile forward, BASELINE.md)."""
    import flax.linen as nn

    from maze_image_processing_pipeline_tpu.models.layers import GroupNorm

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), jnp.float32)
    ours = GroupNorm(num_groups=8)
    ref = nn.GroupNorm(num_groups=8, epsilon=1e-6)
    p1 = ours.init(jax.random.key(0), x)
    p2 = ref.init(jax.random.key(0), x)
    # identical param pytree (names + shapes) => checkpoint compatible
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    scale = jnp.asarray(rng.standard_normal(32), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(32), jnp.float32)
    params = {"params": {"scale": scale, "bias": bias}}
    np.testing.assert_allclose(
        np.asarray(ours.apply(params, x)),
        np.asarray(ref.apply(params, x)),
        rtol=2e-5,
        atol=2e-5,
    )


def test_import_torch_state_dict_unet_parity():
    """A torch U-Net mirroring the flax architecture layer-for-layer (in
    call order) imports to numerically-equivalent flax params. Round-3
    fix: the old importer zipped torch insertion order against flax's
    ALPHABETICAL tree-flatten order (bias < kernel, ConvBlock_10 <
    ConvBlock_2), so it failed on any real model; it now matches modules
    in insertion order and params by name (weight->kernel/scale)."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from maze_image_processing_pipeline_tpu.models import UNet
    from maze_image_processing_pipeline_tpu.models.model_io import (
        import_torch_state_dict,
    )

    def block(cin, cout):
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1),
            nn.GroupNorm(min(8, cout), cout),
            nn.ReLU(),
            nn.Conv2d(cout, cout, 3, padding=1),
            nn.GroupNorm(min(8, cout), cout),
            nn.ReLU(),
        )

    class TorchUNet(nn.Module):
        # Submodules DEFINED in the flax call order: encoder blocks,
        # bottleneck, then per decoder level (up-conv, block), head.
        def __init__(self, cin=3, base=8, depth=2, out=2):
            super().__init__()
            self.depth = depth
            mods, ch = [], cin
            for i in range(depth):
                mods.append(block(ch, base * 2**i))
                ch = base * 2**i
            mods.append(block(ch, base * 2**depth))
            ch = base * 2**depth
            for i in reversed(range(depth)):
                mods.append(nn.Conv2d(ch, base * 2**i, 2, padding="same"))
                mods.append(block(base * 2**i * 2, base * 2**i))
                ch = base * 2**i
            mods.append(nn.Conv2d(ch, out, 1))
            self.mods = nn.ModuleList(mods)
            self.pool = nn.MaxPool2d(2)
            self.up = nn.Upsample(scale_factor=2, mode="nearest")

        def forward(self, x):
            i, skips = 0, []
            for _ in range(self.depth):
                x = self.mods[i](x)
                i += 1
                skips.append(x)
                x = self.pool(x)
            x = self.mods[i](x)
            i += 1
            for d in reversed(range(self.depth)):
                x = self.mods[i](self.up(x))
                i += 1
                x = self.mods[i](torch.cat([skips[d], x], dim=1))
                i += 1
            return self.mods[i](x)

    tnet = TorchUNet().eval()
    fnet = UNet(out_channels=2, base_features=8, depth=2, dtype=jnp.float32)
    fparams = fnet.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    imported = import_torch_state_dict(tnet.state_dict(), fparams)

    x = np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)
    yt = (
        tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        .detach()
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    yf = np.asarray(fnet.apply(imported, jnp.asarray(x)))
    np.testing.assert_allclose(yt, yf, rtol=1e-3, atol=1e-3)


def test_import_torch_state_dict_mismatch_errors():
    """Clear errors on module-count and shape mismatches."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from maze_image_processing_pipeline_tpu.models.model_io import (
        import_torch_state_dict,
    )

    import flax.linen as fnn

    conv = fnn.Conv(4, (3, 3))
    fparams = conv.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))

    with pytest.raises(ValueError, match="Module count"):
        import_torch_state_dict(
            nn.Sequential(nn.Conv2d(3, 4, 3), nn.Conv2d(4, 4, 3)).state_dict(),
            fparams,
        )
    with pytest.raises(ValueError, match="Shape mismatch"):
        import_torch_state_dict(nn.Conv2d(3, 8, 3).state_dict(), fparams)


def test_import_torch_state_dict_rejects_unconsumed_params():
    """A torch module with leftover params (e.g. BatchNorm running stats
    against a stateless flax norm) must raise, not silently drop them."""
    pytest.importorskip("torch")
    import flax.linen as fnn
    import torch.nn as nn

    from maze_image_processing_pipeline_tpu.models.model_io import (
        import_torch_state_dict,
    )

    gn = fnn.GroupNorm(num_groups=2)
    fparams = gn.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)))

    bn = nn.BatchNorm2d(4)  # weight, bias, running_mean, running_var
    with pytest.raises(ValueError, match="running_mean"):
        import_torch_state_dict(bn.state_dict(), fparams)


def test_unet_s2d_matches_full_resolution():
    """The phase-major (s2d) level-0 evaluation is the SAME function as
    the full-resolution one: identical parameter tree, identical init,
    equal outputs up to f32 rounding (models/s2d.py derivation)."""
    import numpy as np

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 48, 3)), jnp.float32)
    for depth in (1, 3):
        full = UNet(out_channels=2, base_features=8, depth=depth,
                    dtype=jnp.float32, s2d=False, w2d=False)
        phase = UNet(out_channels=2, base_features=8, depth=depth,
                     dtype=jnp.float32, s2d=True, s2d_min_pixels=0,
                     w2d=False)
        wboth = UNet(out_channels=2, base_features=8, depth=depth,
                     dtype=jnp.float32, s2d=True, s2d_min_pixels=0,
                     w2d=True, w2d_min_pixels=0)
        p = full.init(jax.random.key(0), x)
        for variant in (phase, wboth):
            p2 = variant.init(jax.random.key(0), x)
            assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)
            for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(p2)):
                np.testing.assert_array_equal(a, b)
            np.testing.assert_allclose(
                full.apply(p, x), variant.apply(p, x), atol=1e-4, rtol=1e-4
            )


def test_unet_s2d_gradients_match():
    """Training through the phase-major path yields the same gradients."""
    import numpy as np

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.random((1, 16, 16, 2)), jnp.float32)

    def loss(module, p):
        return jnp.mean((module.apply(p, x) - y) ** 2)

    full = UNet(out_channels=2, base_features=8, depth=2,
                dtype=jnp.float32, s2d=False, w2d=False)
    phase = UNet(out_channels=2, base_features=8, depth=2,
                 dtype=jnp.float32, s2d=True, s2d_min_pixels=0,
                 w2d=True, w2d_min_pixels=0)
    p = full.init(jax.random.key(0), x)
    gf = jax.grad(lambda p: loss(full, p))(p)
    gp = jax.grad(lambda p: loss(phase, p))(p)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-3)
