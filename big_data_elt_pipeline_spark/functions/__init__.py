"""Scalar/aggregate column-expression helpers (all JVM-side, codegen-able)."""
