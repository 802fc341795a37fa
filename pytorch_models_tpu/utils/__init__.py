from .download import hub_download
from .params import StateDict, stack_layers, to_np

__all__ = ["hub_download", "StateDict", "stack_layers", "to_np"]
