"""Device kernel library (jax.numpy / Pallas) — the TPU compute path.

Replaces the reference's scikit-image/scipy pixel kernels (SURVEY.md §2a row
note: threshold, morphology, labeling, region extraction, distance transforms
→ Pallas/jax.numpy kernels) with batched, fixed-shape XLA ops:

* :mod:`.edt` — bounded squared Euclidean distance transform (the cornerstone:
  shift+min VPU ops; exact within the bound)
* :mod:`.morphology` — disk/isotropic binary morphology derived from the EDT
* :mod:`.label` — connected components via alternating segmented min-scans
* :mod:`.regionprops` — per-region moments/intensity statistics via segment
  reductions and histogram scatter
* :mod:`.zooprocess` — ZooProcess-style morphometric feature vectors
* :mod:`.merge_labels` — bridge-merging of nearby segments (device EDT +
  host greedy loop)
* :mod:`.tiling` — tile split / linear-blend reassembly as device ops
* :mod:`.image` — dtype conversion, rescale, pad/crop helpers
"""

from . import edt, image, label, morphology, regionprops  # noqa: F401
