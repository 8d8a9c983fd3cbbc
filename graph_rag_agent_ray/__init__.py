"""graph_rag_agent_ray — Ray-Data-native knowledge-graph construction engine.

From-scratch re-expression of the build path of ``ss7lyb/graph-rag-agent``
(chunk → LLM triple extraction → entity linking/canonicalization → community
detection → summarization → graph materialization) as streaming
``ray.data.Dataset`` pipelines. See SURVEY.md for the structural analysis of
the reference and the operator-by-operator mapping.
"""

from .config import DEFAULT_CONFIG, KGConfig
from .pipelines.build import build_kg

__all__ = ["KGConfig", "DEFAULT_CONFIG", "build_kg"]
__version__ = "0.1.0"
