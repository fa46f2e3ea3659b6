"""Shared utilities: HF weight import, misc helpers."""
