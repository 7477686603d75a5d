"""Compute kernels ("ops"): noise, filters, geologic, mesh — SURVEY.md L2."""
