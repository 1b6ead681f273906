"""Plan-shape utilities: helpers that exist to produce the *right physical
plan*, not new semantics. See shape.py."""

from komodo_data_spark.plans.shape import exploded  # noqa: F401
