"""graph_rag_agent_ray — Ray-Data-native knowledge-graph construction engine.

From-scratch re-expression of the build path of ``ss7lyb/graph-rag-agent``
(chunk → LLM triple extraction → entity linking/canonicalization → community
detection → summarization → graph materialization) as streaming
``ray.data.Dataset`` pipelines. See SURVEY.md for the structural analysis of
the reference and the operator-by-operator mapping.
"""

import logging as _logging


class _DropSchemaHashNoise(_logging.Filter):
    """Ray Data logs a harmless 'Failed to hash the schemas (for
    deduplication)' warning per task on list-typed columns (the hash is only
    a fast-path probe; unification proceeds regardless). This package is
    imported inside every worker, so installing the filter here silences the
    spam cluster-wide without touching real warnings."""

    def filter(self, record: _logging.LogRecord) -> bool:  # noqa: A003
        return not str(record.getMessage()).startswith(
            "Failed to hash the schemas")


_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_DropSchemaHashNoise())

from .config import DEFAULT_CONFIG, KGConfig  # noqa: E402
from .pipelines.build import build_kg  # noqa: E402

__all__ = ["KGConfig", "DEFAULT_CONFIG", "build_kg"]
__version__ = "0.1.0"
