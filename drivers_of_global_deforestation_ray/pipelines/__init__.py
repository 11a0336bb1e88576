"""Flagship pipeline + straight-line golden reference implementation."""
