from .encode_stage import DecodeShard, EncodeShard, add_salt_column, row_fingerprints

__all__ = ["EncodeShard", "DecodeShard", "add_salt_column", "row_fingerprints"]
