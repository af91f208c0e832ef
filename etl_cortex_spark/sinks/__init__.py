"""Sinks: driver-side xlsx book writer (A20) + distributed file writers (B9/B10/C5)."""
