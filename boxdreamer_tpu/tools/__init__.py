"""Offline tooling: reference-DB view sampling, checkpoint conversion,
dataset preparation."""
