"""Scalar/column function families: calendar, strings, math, arrays, text,
vectors.  All built-in compositions (JVM-side, codegen) — no row-at-a-time
Python UDFs anywhere in this package.
"""
