"""Reusable column-expression helpers (all JVM-side built-ins unless noted)."""
