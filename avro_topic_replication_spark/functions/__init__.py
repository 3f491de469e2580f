"""Deterministic column-function helpers (JVM-side, codegen-friendly)."""

from .numeric import dec, dec_sum, dec_avg, dec_sum_sql, dec_avg_sql  # noqa: F401
