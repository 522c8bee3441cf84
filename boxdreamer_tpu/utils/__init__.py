"""Shared utilities: precision policy, config handling, logging."""
