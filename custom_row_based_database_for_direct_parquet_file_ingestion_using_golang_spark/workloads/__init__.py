"""Driver-facing workload: the query inventory for correctness + bench.

Submodules register into the shared registry on import:
  core       — the reference's own operator surface (SURVEY.md §2.1-2.6)
  relational — beyond-reference relational tier (joins, windows, set ops,
               subqueries — SURVEY.md §2.8 "our engine" column)
  scale      — LLM-data-pipeline tier (dedup, similarity, text analysis)
"""

from .registry import QUERIES, ORACLES, load, query, r2  # noqa: F401
from . import core  # noqa: F401, E402
from . import relational  # noqa: F401, E402
from . import scale  # noqa: F401, E402
from . import streaming  # noqa: F401, E402
