"""Bridge-merging of nearby labeled segments.

Capability parity with ``maze_ipp/merge_labels.py:29-113`` (used by the
segmentation post-processing at ``loki/pipeline.py:451-457``): labeled
segments closer than ``max_distance`` are unified, connecting their closest
points with a bridge whose width is controlled by ``path_tolerance``.

TPU-first split: the per-label Euclidean distance fields — the expensive part
— are computed for *all* labels in one batched device dispatch
(:func:`..ops.edt.edt` vmapped over the one-hot label masks); the greedy
nearest-first merge loop (data-dependent, tiny) runs on host over the
precomputed fields.
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .edt import squared_edt

__all__ = ["merge_labels"]


def _label_distance_fields(labels: np.ndarray, ids: np.ndarray, bound: int) -> np.ndarray:
    """(R, H, W) float32 distance-to-label fields in one device dispatch."""
    lab = jnp.asarray(labels)
    masks = lab[None, :, :] == jnp.asarray(ids)[:, None, None]
    sq = jax.vmap(lambda m: squared_edt(m, bound))(masks)
    return np.sqrt(np.asarray(sq, dtype=np.float32))


def merge_labels(
    labels: np.ndarray,
    index: Optional[List[int]] = None,
    max_distance: Optional[float] = None,
    path_tolerance: float = 5,
    return_merge_distances: bool = False,
    labels_out: Optional[np.ndarray] = None,
):
    """Merge neighboring labels by bridging their closest points.

    Args:
        labels: 2D label image.
        index: labels to process (default: all positive labels).
        max_distance: maximum gap distance to merge; None merges everything.
        path_tolerance: widens the bridge (sum-of-distances band).
        return_merge_distances: additionally return the gap distance at which
            each merge happened.
        labels_out: optional output buffer (defaults to a copy).

    Returns:
        labels_out, and merge_distances if requested.
    """
    labels = np.asarray(labels)
    if index is None:
        uniq = np.unique(labels)
        index = [int(v) for v in uniq[uniq > 0]]
    else:
        index = [int(v) for v in index]

    if labels_out is not None and labels_out is not labels:
        # The early return below must hand back the input labels, not an
        # untouched (possibly uninitialized) caller buffer.
        np.copyto(labels_out, labels)
    if return_merge_distances:
        empty_result = (labels if labels_out is None else labels_out, [])
    else:
        empty_result = labels if labels_out is None else labels_out
    if len(index) < 2:
        return empty_result

    if labels_out is None:
        labels_out = labels.copy()

    H, W = labels.shape
    if max_distance is None:
        bound = int(math.ceil(math.hypot(H, W)))
    else:
        bound = int(math.ceil(max_distance + path_tolerance)) + 1

    ids = np.asarray(index, dtype=labels.dtype)
    fields = _label_distance_fields(labels, ids, bound)  # (R, H, W)
    field_of = {lab_id: fields[i] for i, lab_id in enumerate(index)}

    # Seed the cluster with the first label.
    first = index.pop(0)
    labels_out[labels == first] = first

    distmap = field_of[first].copy()
    max_dist = float(distmap.max())
    labelmap = np.full(labels.shape, first, dtype=labels.dtype)

    merge_distances: List[float] = []

    while index:
        # Unmerged label nearest to the current cluster.
        nearest_pos = int(
            np.argmin(
                [distmap[labels == lab_id].min(initial=max_dist) for lab_id in index]
            )
        )
        cur = index.pop(nearest_pos)
        cur_dist = field_of[cur]

        total = distmap + cur_dist
        merge_dist = float(total.min())

        if max_distance is not None and merge_dist > max_distance:
            # Greedy order guarantees no later candidate is nearer.
            break

        bridge = (labels == cur) | (total <= merge_dist + path_tolerance)
        merge_distances.append(merge_dist)

        target_labels = np.unique(labelmap[bridge])
        target = int(target_labels[0])
        if len(target_labels) > 1:
            # The bridge band touched more than one cluster member; keep the
            # nearest one (smallest distance at the meeting point).
            meet = np.unravel_index(np.argmin(total), total.shape)
            target = int(labelmap[meet])

        labels_out[bridge] = target

        closer = cur_dist < distmap
        labelmap[closer] = target
        distmap[closer] = cur_dist[closer]

    if return_merge_distances:
        return labels_out, merge_distances
    return labels_out
