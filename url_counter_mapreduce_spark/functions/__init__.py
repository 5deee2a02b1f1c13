"""Reusable Catalyst expression builders (vector math, hashing)."""
