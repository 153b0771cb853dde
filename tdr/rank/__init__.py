from tdr.rank.router import LanguageRouter, build_language_models
from tdr.rank.cascade import CascadeRetriever, cascade_score_topk
from tdr.rank.sentence import (
    SentenceBM25,
    SentenceLmCascade,
    candidate_union,
)
from tdr.rank.single_index import SingleIndexRetriever
from tdr.rank.segmented import SegmentedBM25
from tdr.rank.fuse import rrf_fuse
from tdr.rank.feedback import DocMajorIndex, build_doc_major, prf_expand

__all__ = ["LanguageRouter", "build_language_models", "CascadeRetriever",
           "cascade_score_topk", "SentenceBM25", "SentenceLmCascade",
           "candidate_union", "SingleIndexRetriever", "SegmentedBM25",
           "DocMajorIndex", "build_doc_major", "prf_expand",
           "rrf_fuse"]
