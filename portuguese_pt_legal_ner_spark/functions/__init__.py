"""Reusable column-expression builders (pure pyspark.sql.functions)."""
