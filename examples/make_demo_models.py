"""Create small demo model checkpoints for the example task files.

Usage: python examples/make_demo_models.py [target_dir]

Produces:
    <target>/loki-unet       — U-Net (1 fg channel) for `maze-ipp loki` jax segmentation
    <target>/oilsack-unet    — U-Net (2 channels: Prosoma, Oilsack) for semseg
    <target>/polytaxo-cnn    — classifier matching docs/predict.md's taxonomy example

The parameters are randomly initialized (demo/benchmark fixtures, not
trained); train with models.train_loop.fit.
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from maze_image_processing_pipeline_tpu.models import ConvClassifier, UNet, save_model


def main(target: str = "./models") -> None:
    rng = jax.random.key(0)

    unet1 = UNet(out_channels=1, base_features=16, depth=3, dtype=jnp.bfloat16)
    params = unet1.init(rng, jnp.zeros((1, 64, 64, 3)))
    save_model(
        f"{target}/loki-unet",
        unet1,
        params,
        outputs={"pred": {"channel_names": ["foreground"]}},
    )

    unet2 = UNet(out_channels=2, base_features=16, depth=3, dtype=jnp.bfloat16)
    params = unet2.init(rng, jnp.zeros((1, 64, 64, 3)))
    save_model(
        f"{target}/oilsack-unet",
        unet2,
        params,
        outputs={"pred": {"channel_names": ["Prosoma", "Oilsack"]}},
    )

    clf = ConvClassifier(n_outputs=8, features=(16, 32, 64), dtype=jnp.bfloat16)
    params = clf.init(rng, jnp.zeros((1, 256, 256, 3)))
    save_model(
        f"{target}/polytaxo-cnn",
        clf,
        params,
        outputs={"probs": {}},
    )

    print(f"Demo checkpoints written under {target}/")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "./models")
