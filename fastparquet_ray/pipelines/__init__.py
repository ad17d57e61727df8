from .compact import compact_shards
from .decode import decode_dataset
from .encode import encode_pipeline
from .verify import verify_roundtrip

__all__ = [
    "compact_shards",
    "decode_dataset",
    "encode_pipeline",
    "verify_roundtrip",
]
