from tdr.rank.router import LanguageRouter, build_language_models
from tdr.rank.cascade import CascadeRetriever
from tdr.rank.single_index import SingleIndexRetriever

__all__ = ["LanguageRouter", "build_language_models", "CascadeRetriever",
           "SingleIndexRetriever"]
