from .encode import encode_pipeline
from .decode import decode_dataset
from .verify import verify_roundtrip

__all__ = ["encode_pipeline", "decode_dataset", "verify_roundtrip"]
