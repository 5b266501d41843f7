"""Data pipeline: H5 ingest, windowing, host-side encoders, prefetch."""
