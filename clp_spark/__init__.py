"""clp_spark: a PySpark-native log/telemetry engine with CLP's capabilities.

Public API (the analog of CLP's ffi encode/decode libraries,
reference components/core/src/clp/ffi/encoding_methods.hpp:58-148):

    from clp_spark import encode_text, decode_text         # single message
    from clp_spark.plans.pipeline import parse_encode      # DataFrame pass
    from clp_spark.plans.ingest import ingest, decode_archive, search_archives
    from clp_spark.plans.grep import search                # wildcard search
    from clp_spark.plans.kql import kql_filter             # KQL subset
    from clp_spark.streaming.ingest import stream_ingest   # micro-batch

See README.md for the module map and SURVEY.md for the reference analysis.
"""

from .functions.encoding import (  # noqa: F401
    decode_float,
    decode_int,
    encode_float,
    encode_int,
)
from .functions.tokenizer import decode_text, encode_text  # noqa: F401

__all__ = [
    "encode_text",
    "decode_text",
    "encode_int",
    "decode_int",
    "encode_float",
    "decode_float",
]
__version__ = "0.1.0"
