from tdr.models.sparse import BM25Model, TfidfCosineModel, SparseModel

__all__ = ["BM25Model", "TfidfCosineModel", "SparseModel"]
