"""Shared utilities: timing/metrics mirroring the reference drivers."""
