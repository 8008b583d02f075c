"""Query-language frontends: InfluxQL subset + annotated-CSV output.

The data plane the reference provisions is queried via Flux
(``POST /api/v2/query``) or InfluxQL (v1 ``/query`` via DBRP mapping);
results serialize as annotated CSV (SURVEY.md §2.2.1). The fluent
:mod:`..plans.pipeline` DSL is the primary API; these frontends accept
query strings and produce the same DataFrame plans.
"""

from .influxql import InfluxQLError, execute_influxql, execute_show, parse_influxql  # noqa: F401
from .flux import FluxError, execute_flux, execute_flux_multi, flux_runtime_errors  # noqa: F401
from .annotated_csv import from_annotated_csv, iter_annotated_csv, to_annotated_csv  # noqa: F401
