"""Lineage manifests and resume state."""
