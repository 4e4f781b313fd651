"""LOKI re-segmentation workload (the flagship pipeline)."""
