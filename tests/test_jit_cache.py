"""Process-level jit program memoization (jit_cache).

Through the TPU tunnel, each DISTINCT jitted program pays a 5-800 s
executable load per process (BASELINE.md round-3 finding); the reference
builds one pipeline per task run (``/root/reference/maze_ipp/loki/
pipeline.py:103-130``), so a service running several tasks must reuse the
wrapper objects or it re-pays every load. These tests pin the contract:
same trace-relevant config → the SAME program object; different config →
a different one.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from maze_image_processing_pipeline_tpu import jit_cache
from maze_image_processing_pipeline_tpu.loki.config_schema import (
    SegmentationPostprocessingConfig,
)
from maze_image_processing_pipeline_tpu.loki.pipeline import _make_frame_chain
from maze_image_processing_pipeline_tpu.models import UNet
from maze_image_processing_pipeline_tpu.models.model_io import LoadedModel


def test_get_program_memoizes_and_clear_resets():
    jit_cache.clear()
    calls = []

    def build():
        calls.append(1)
        return object()

    a = jit_cache.get_program(("k", 1), build)
    b = jit_cache.get_program(("k", 1), build)
    assert a is b and len(calls) == 1
    jit_cache.clear()
    c = jit_cache.get_program(("k", 1), build)
    assert c is not a and len(calls) == 2


def test_get_program_unhashable_key_falls_back_uncached():
    jit_cache.clear()
    key = ("k", [1, 2])  # list → unhashable
    a = jit_cache.get_program(key, object)
    b = jit_cache.get_program(key, object)
    assert a is not b


def test_frame_chain_shared_across_equal_configs():
    cfg1 = SegmentationPostprocessingConfig(min_area=30, closing_radius=2)
    cfg2 = SegmentationPostprocessingConfig(min_area=30, closing_radius=2)
    chain1, keys1 = _make_frame_chain(cfg1)
    chain2, keys2 = _make_frame_chain(cfg2)
    assert chain1 is chain2
    assert keys1 is keys2

    cfg3 = SegmentationPostprocessingConfig(min_area=99, closing_radius=2)
    chain3, keys3 = _make_frame_chain(cfg3)
    assert chain3 is not chain1
    # Distinct chains own distinct pack-key lists (round-2 verdict item:
    # two chains with different prop configs must unpack independently).
    assert keys3 is not keys1


def test_frame_chain_works_after_cache_hit():
    cfg = SegmentationPostprocessingConfig(min_area=5)
    chain, pack_keys = _make_frame_chain(cfg)
    pred = jnp.zeros((1, 64, 128), jnp.float32).at[0, 10:20, 10:30].set(1.0)
    img = jnp.full((1, 64, 128), 200, jnp.uint8)
    flat = np.asarray(chain(pred, img))
    # Re-build (cache hit) and reuse on the same inputs.
    chain2, pack_keys2 = _make_frame_chain(
        SegmentationPostprocessingConfig(min_area=5)
    )
    assert chain2 is chain
    flat2 = np.asarray(chain2(pred, img))
    np.testing.assert_array_equal(flat, flat2)
    assert pack_keys  # filled at first trace
    assert pack_keys2 is pack_keys


def _tiny_model(out_channels=1):
    module = UNet(out_channels=out_channels, base_features=4, depth=1)
    params = module.init(
        __import__("jax").random.key(0), jnp.zeros((1, 32, 32, 3))
    )
    return LoadedModel(module, params, {})


def test_jax_inference_step_shared_across_equal_models():
    from maze_image_processing_pipeline_tpu.engine.core import Pipeline
    from maze_image_processing_pipeline_tpu.models.inference import JaxInference

    m1 = _tiny_model()
    m2 = _tiny_model()
    assert m1.module == m2.module

    cls = JaxInference.node_class
    with Pipeline():
        n1 = cls(m1, None, batch_size=2)
        n2 = cls(m2, None, batch_size=2)
        # A different architecture gets its own program.
        n3 = cls(_tiny_model(out_channels=2), None, batch_size=2)
    assert n1._step is n2._step
    assert n3._step is not n1._step


def test_device_tiled_inference_programs_shared():
    from maze_image_processing_pipeline_tpu.engine.core import Pipeline
    from maze_image_processing_pipeline_tpu.models.inference import (
        DeviceTiledInference,
    )

    cls = DeviceTiledInference.node_class
    m1, m2 = _tiny_model(), _tiny_model()
    with Pipeline():
        n1 = cls(m1, None, tile_size=32, tile_stride=24)
        n2 = cls(m2, None, tile_size=32, tile_stride=24)
    assert n1._step is n2._step
    td = n1.transfer_dtype
    assert n1._programs(64, 64, 64, 64, td) is n2._programs(64, 64, 64, 64, td)
    assert n1._programs(64, 128, 64, 128, td) is not n1._programs(64, 64, 64, 64, td)
    # The fetch-crop window is part of the program identity too.
    assert n1._programs(64, 64, 32, 64, td) is not n1._programs(64, 64, 64, 64, td)
    # ... and the transfer dtype (the blend emits f32 when the fused
    # measurement will cast for transfer instead).
    import numpy as np
    assert n1._programs(64, 64, 64, 64, np.float16) is not n1._programs(
        64, 64, 64, 64, None
    )
