from .smallfloat import (  # noqa: F401
    NORM_TABLE,
    byte315_to_float,
    float_to_byte315,
    norm_byte_for_length,
    norm_bytes_for_lengths,
)
from .bm25 import BM25Params, LuceneOracle  # noqa: F401
