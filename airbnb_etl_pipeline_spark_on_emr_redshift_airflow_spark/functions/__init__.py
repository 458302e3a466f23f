"""Scalar column functions: text classifiers, JSON helpers, keys."""
