"""Utility modules (normalization, host splines, assets)."""
