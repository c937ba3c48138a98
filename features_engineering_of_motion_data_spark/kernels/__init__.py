"""Vectorized numpy kernels executed inside Arrow-batched pandas UDFs.

Everything in this package is pure numpy over column arrays — zero per-row
Python (BASELINE.json input_hint) — and independent of Spark so the codecs
and gap-fill math are unit/property-testable standalone.
"""
