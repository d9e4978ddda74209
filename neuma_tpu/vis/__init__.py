from .instance import NeuMAInstance
from .viewer import DynamicViewer

__all__ = ["NeuMAInstance", "DynamicViewer"]
