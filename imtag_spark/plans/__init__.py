"""Superstep driver plumbing: checkpoint/resume manifests, lineage truncation."""
