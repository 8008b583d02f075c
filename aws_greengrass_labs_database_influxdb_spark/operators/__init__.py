"""Flux/InfluxQL operator library, re-expressed as DataFrame → DataFrame.

Each public function implements one row of SURVEY.md §2.2. All are
declarative compositions of ``pyspark.sql`` built-ins (Catalyst
optimizes/pushes down); pandas UDFs appear only where semantics are
genuinely recursive (EMA family, Holt-Winters).

Flux "group key" (per-series) semantics: every per-series operator takes
``by`` — the list of columns identifying a series/table — and applies
its logic within that key, matching Flux's stream-of-tables model.
"""

from .errors import OperatorValidationError  # noqa: F401
from .core import (  # noqa: F401
    drop,
    duplicate,
    fields_as_cols,
    filter_expr,
    hour_selection,
    keep,
    map_columns,
    pivot,
    push_time_filter,
    range_time,
    rename,
    set_constant,
    time_shift,
    truncate_time,
)
from .aggregates import (  # noqa: F401
    aggregate,
    integral,
    mode_value,
    quantile,
    spread,
    time_weighted_avg,
)
from .selectors import (  # noqa: F401
    bottom,
    distinct_rows,
    first,
    highest_average,
    highest_current,
    highest_max,
    last,
    lowest_average,
    lowest_current,
    lowest_min,
    max_selector,
    min_selector,
    sample,
    top,
    unique,
)
from .windows import (  # noqa: F401
    aggregate_window,
    fill,
    interpolate_linear,
    session_window,
    window,
    window_spine,
)
from .analytics import (  # noqa: F401
    chande_momentum_oscillator,
    covariance,
    cumulative_sum,
    deadman,
    derivative,
    difference,
    double_ema,
    elapsed,
    exponential_moving_average,
    histogram,
    histogram_quantile,
    holt_winters,
    increase,
    kaufmans_ama,
    kaufmans_er,
    moving_average,
    pearsonr,
    relative_strength_index,
    events_duration,
    state_changes,
    state_count,
    state_duration,
    timed_moving_average,
    triple_ema,
    triple_exponential_derivative,
)
from .sortlimit import limit, sort, tail, slimit  # noqa: F401
from .joins import asof_join  # noqa: F401
