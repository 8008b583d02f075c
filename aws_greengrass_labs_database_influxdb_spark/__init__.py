"""PySpark-native time-series analytics engine.

A from-scratch re-expression of the data-plane capabilities delivered by
``awslabs/aws-greengrass-labs-database-influxdb`` (an AWS IoT Greengrass
component that provisions and token-vends an InfluxDB 2.0.9 instance —
see ``/root/reference/recipe.yaml:110``), built Spark-first:

- **Layer A** (control plane: provisioning, secrets, scoped tokens,
  pub/sub token vending) lives in :mod:`.control` as plain Python —
  reference behavior per ``src/influxdb_utils.sh``,
  ``src/influxDBTokenPublisher.py``, ``src/influxDBTokenStreamHandler.py``.
- **Layer B** (the InfluxDB 2.x data plane: line-protocol ingest, the
  Flux/InfluxQL operator surface, buckets + retention, tasks) is
  re-implemented on the PySpark DataFrame API: :mod:`.sources`,
  :mod:`.operators`, :mod:`.plans`, :mod:`.streaming`.
- :mod:`.ext` adds the large-scale training-data pipeline surface
  (dedup, similarity search, text analysis, multimodal plumbing).

Design notes: declarative DataFrame plans (Catalyst owns optimization),
ns-fidelity via a ``time_ns`` long column alongside µs ``time``,
last-write-wins upsert as an explicit dedup, and per-series (Flux
"group key") semantics threaded through every operator.
"""

__version__ = "0.1.0"
