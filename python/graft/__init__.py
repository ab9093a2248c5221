from graft.tables import GraftTable  # noqa: F401

__all__ = ["GraftTable"]
