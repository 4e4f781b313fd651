"""Model checkpoint I/O with the self-describing meta.json contract.

Replaces TorchScript model files + embedded ``meta.json``
(``predict/pipeline.py:583-619``): a model checkpoint is a directory

    model_dir/
        params.msgpack   — flax-serialized parameter pytree
        meta.json        — architecture + model-metadata contract

``meta.json`` fields:

* ``architecture``: ``{"type": "unet"|"conv_classifier", "config": {...}}``
  so loading needs no Python-side model definition.
* ``outputs``: ordered mapping of output name → ``{"channel_names": [...]}``
  (the contract validated by ``ModelMetaSchema``,
  ``predict/config_schema.py:32-42``). Exactly one output is supported by
  the predict workload.
* free extra keys (the schema is extra-allow, like the reference's).

A torch-weights importer (:func:`import_torch_state_dict`) maps PyTorch
``Conv2d``/BN state dicts (OIHW) onto the flax modules (HWIO) so existing
reference checkpoints can be converted offline.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Mapping, Optional

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np

from .classifier import ConvClassifier
from .unet import UNet

__all__ = ["LoadedModel", "save_model", "load_model", "build_model"]

_ARCHITECTURES = {
    "unet": UNet,
    "conv_classifier": ConvClassifier,
}

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
}


@dataclass
class LoadedModel:
    """A ready-to-run model: module, params, and metadata."""

    module: Any
    params: Dict
    meta: Dict = field(default_factory=dict)

    @property
    def apply(self) -> Callable:
        return self.module.apply

    def __call__(self, x):
        return self.module.apply(self.params, x)

    @property
    def output_channel_names(self):
        outputs = self.meta.get("outputs") or {}
        if not outputs:
            return None
        (desc,) = list(outputs.values())[:1]
        return desc.get("channel_names")

    def cast(self, dtype: str) -> "LoadedModel":
        """Return a copy with the compute dtype switched (params stay f32)."""
        cfg = dict(self.meta.get("architecture", {}).get("config", {}))
        cfg["dtype"] = dtype
        arch_type = self.meta.get("architecture", {}).get("type")
        module = build_model(arch_type, cfg)
        meta = dict(self.meta)
        meta["architecture"] = {"type": arch_type, "config": cfg}
        return LoadedModel(module, self.params, meta)


def build_model(arch_type: str, config: Dict) -> Any:
    if arch_type not in _ARCHITECTURES:
        raise ValueError(
            f"Unknown architecture {arch_type!r}; known: {sorted(_ARCHITECTURES)}"
        )
    config = dict(config)
    if "dtype" in config and isinstance(config["dtype"], str):
        config["dtype"] = _DTYPES[config["dtype"]]
    if "features" in config and isinstance(config["features"], list):
        config["features"] = tuple(config["features"])
    return _ARCHITECTURES[arch_type](**config)


def save_model(
    model_dir: str,
    module: Any,
    params: Dict,
    *,
    outputs: Optional[Dict[str, Dict]] = None,
    extra_meta: Optional[Dict] = None,
) -> None:
    """Save params + self-describing meta.json to ``model_dir``."""
    os.makedirs(model_dir, exist_ok=True)

    arch_type = {v: k for k, v in _ARCHITECTURES.items()}[type(module)]
    config = {}
    for fname in type(module).__dataclass_fields__:
        if fname in ("parent", "name"):
            continue
        value = getattr(module, fname)
        if value in (jnp.bfloat16, jnp.float32, jnp.float16):
            value = {jnp.bfloat16: "bfloat16", jnp.float32: "float32", jnp.float16: "float16"}[value]
        if isinstance(value, tuple):
            value = list(value)
        config[fname] = value

    meta = {
        "format": "maze-ipp-tpu-model",
        "architecture": {"type": arch_type, "config": config},
    }
    if outputs is not None:
        meta["outputs"] = outputs
    if extra_meta:
        meta.update(extra_meta)

    params = jax.tree.map(lambda a: np.asarray(a), params)
    with open(os.path.join(model_dir, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    with open(os.path.join(model_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_model(model_fn: str, dtype: Optional[str] = None) -> LoadedModel:
    """Load a model checkpoint directory (or its params.msgpack path)."""
    model_dir = model_fn
    if model_dir.endswith(".msgpack"):
        model_dir = os.path.dirname(model_dir)

    meta_fn = os.path.join(model_dir, "meta.json")
    with open(meta_fn) as f:
        meta = json.load(f)

    arch = meta.get("architecture") or {}
    config = dict(arch.get("config", {}))
    arch_cls = _ARCHITECTURES.get(arch.get("type"))
    if dtype is not None and arch_cls is not None and (
        "dtype" in getattr(arch_cls, "__dataclass_fields__", {})
    ):
        config["dtype"] = dtype
    module = build_model(arch.get("type"), config)
    meta = dict(meta)
    meta["architecture"] = {"type": arch.get("type"), "config": config}

    with open(os.path.join(model_dir, "params.msgpack"), "rb") as f:
        data = f.read()

    # Build a template pytree to restore into.
    params = flax.serialization.msgpack_restore(data)
    return LoadedModel(module, params, meta)


def import_torch_state_dict(state_dict: Dict, flax_params: Dict) -> Dict:
    """Map a torch state dict onto a flax param pytree of the same topology.

    Modules are matched in order: the nested flax params dict is walked in
    INSERTION order (= flax module call order; ``tree_flatten_with_path``
    would sort alphabetically, putting ``bias`` before ``kernel`` and
    ``ConvBlock_10`` before ``ConvBlock_2``), and the torch state dict is
    grouped by submodule prefix in its own order — so the torch module must
    mirror the flax architecture layer-for-layer *in definition order*.
    Within each module, params match by name: torch ``weight`` → flax
    ``kernel`` (conv OIHW → HWIO, linear (out, in) → (in, out)) or
    ``scale`` (norm layers), ``bias`` → ``bias``.
    """

    def walk(d, path=()):
        for k, v in d.items():
            if isinstance(v, Mapping) or hasattr(v, "items"):
                yield from walk(v, path + (k,))
            else:
                yield path + (k,), v

    flax_modules: Dict[tuple, Dict[str, np.ndarray]] = {}
    for path, leaf in walk(flax_params):
        flax_modules.setdefault(path[:-1], {})[path[-1]] = leaf

    torch_modules: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in state_dict.items():
        if "num_batches_tracked" in k:
            continue
        prefix, _, name = k.rpartition(".")
        torch_modules.setdefault(prefix, {})[name] = np.asarray(v)

    if len(flax_modules) != len(torch_modules):
        raise ValueError(
            f"Module count mismatch: flax {len(flax_modules)} "
            f"({list(flax_modules)}) vs torch {len(torch_modules)} "
            f"({list(torch_modules)})"
        )

    out: Dict = {}  # fresh nested dicts: works for FrozenDict inputs too

    def assign(d, path, value):
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = value

    for (fpath, fleaves), (tname, tleaves) in zip(
        flax_modules.items(), torch_modules.items()
    ):
        # Every torch param must be CONSUMED, not just every flax param
        # satisfied: e.g. a torch BatchNorm ({weight, bias, running_mean,
        # running_var}) zipped against a flax GroupNorm ({scale, bias})
        # would otherwise "import" while silently dropping the running
        # statistics the checkpoint's semantics depend on.
        consumed = {
            "weight" if ln in ("kernel", "scale") and "weight" in tleaves else ln
            for ln in fleaves
        }
        unconsumed = set(tleaves) - consumed
        if unconsumed:
            raise ValueError(
                f"Torch module '{tname}' has params {sorted(unconsumed)} "
                f"with no counterpart in flax module {fpath} "
                f"({sorted(fleaves)}) — the architectures differ "
                "(e.g. BatchNorm running stats vs a stateless norm)."
            )
        for leaf_name, target in fleaves.items():
            if leaf_name in ("kernel", "scale") and "weight" in tleaves:
                arr = tleaves["weight"]
                if leaf_name == "kernel" and arr.ndim == 4:
                    arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
                elif leaf_name == "kernel" and arr.ndim == 2:
                    arr = arr.T  # (out, in) -> (in, out)
            elif leaf_name in tleaves:
                arr = tleaves[leaf_name]
            else:
                raise ValueError(
                    f"No torch param for {fpath + (leaf_name,)} in "
                    f"{tname} ({sorted(tleaves)})"
                )
            target = np.asarray(target)
            if arr.shape != target.shape:
                raise ValueError(
                    f"Shape mismatch at {fpath + (leaf_name,)} / {tname}: "
                    f"{arr.shape} vs {target.shape}"
                )
            assign(out, fpath + (leaf_name,), arr.astype(target.dtype))

    return out
