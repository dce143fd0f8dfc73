from .srcnn import SRCNN

__all__ = ["SRCNN"]
