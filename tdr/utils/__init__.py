from tdr.utils.config import (
    BM25Config,
    DataConfig,
    DenseConfig,
    IndexConfig,
    MeshConfig,
    RetrievalConfig,
    TdrConfig,
)
from tdr.utils.trace import phase_timer, Tracer

__all__ = [
    "BM25Config",
    "DataConfig",
    "DenseConfig",
    "IndexConfig",
    "MeshConfig",
    "RetrievalConfig",
    "TdrConfig",
    "phase_timer",
    "Tracer",
]
