from .fprs import FprsDatasource, read_fprs

__all__ = ["FprsDatasource", "read_fprs"]
