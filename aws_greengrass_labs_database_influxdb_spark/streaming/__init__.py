"""Streaming layer: continuous line-protocol ingest, scheduled
downsampling tasks, threshold checks (SURVEY.md §2.2.9)."""

from .dedup import stream_exact_dedup  # noqa: F401
from .ingest import stream_lineprotocol_ingest  # noqa: F401
from .tasks import DownsampleTask, RollupMaintenanceTask, ThresholdCheck  # noqa: F401
