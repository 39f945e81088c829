from .registry import QUERIES, ORACLE, query

# importing the suites populates the registry
from . import core  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import vectors  # noqa: E402,F401
from . import temporal  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import mlprep  # noqa: E402,F401
from . import udx  # noqa: E402,F401
from . import geo  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import datapipe  # noqa: E402,F401
from . import pipelineq  # noqa: E402,F401
from . import retrieval  # noqa: E402,F401
from . import inference  # noqa: E402,F401
from . import stattests  # noqa: E402,F401
from ..streaming import events_stream  # noqa: E402,F401
from ..streaming import docs_stream  # noqa: E402,F401
from ..multimodal import media  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE", "query"]
