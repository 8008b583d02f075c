"""Query plans: the fluent pipeline builder (the engine's only IR)."""

from .pipeline import Pipeline, from_bucket, from_points  # noqa: F401
