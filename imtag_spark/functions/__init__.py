"""Scalar/column function helpers (vertex hashing, vector math)."""
