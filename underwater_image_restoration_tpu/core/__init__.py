from .config import Config, from_namespace
from .dtypes import DTypePolicy, resolve_dtype
from .meshes import make_mesh, data_sharding, replicated

__all__ = [
    "Config",
    "from_namespace",
    "DTypePolicy",
    "resolve_dtype",
    "make_mesh",
    "data_sharding",
    "replicated",
]
