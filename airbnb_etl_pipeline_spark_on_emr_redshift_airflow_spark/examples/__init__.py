"""Executable end-to-end pipelines composing the engine's operators."""
