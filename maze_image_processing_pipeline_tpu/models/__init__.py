"""Model zoo: flax U-Net segmentation + CNN classifier, checkpoints, inference.

Replaces the reference's TorchScript models (``loki/pipeline.py:493``,
``predict/pipeline.py:583-619``) with TPU-native flax modules:

* NHWC layout, bf16 compute — the layout/dtype the MXU wants,
* a sidecar ``meta.json`` carrying the model-metadata contract
  (``outputs.{name}.channel_names``, cf. ``predict/config_schema.py:22-42``)
  plus the architecture config so checkpoints are self-describing,
* :class:`.inference.JaxInference` — the batched async inference stream node
  (the TPU re-imagination of the ``PyTorch`` node, SURVEY.md §3.5),
* :mod:`.train` — sharded training steps (dp/sp/tp over a device mesh).
"""

from .unet import UNet
from .classifier import ConvClassifier
from .model_io import LoadedModel, load_model, save_model
from .inference import DeviceTiledInference, JaxInference

__all__ = [
    "UNet",
    "ConvClassifier",
    "LoadedModel",
    "load_model",
    "save_model",
    "DeviceTiledInference",
    "JaxInference",
]
