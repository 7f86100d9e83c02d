"""Spark-side operators of the KG-construction engine."""
