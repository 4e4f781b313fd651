"""Prediction workload: semantic segmentation, feature export, polytaxo."""
