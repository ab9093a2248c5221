from graft.tables import GraftTable  # noqa: F401
from graft import ml  # noqa: F401

__all__ = ["GraftTable", "ml"]
