"""Reusable column-expression builders (JVM-side first)."""
