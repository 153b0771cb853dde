from tdr.rank.router import LanguageRouter, build_language_models
from tdr.rank.cascade import CascadeRetriever

__all__ = ["LanguageRouter", "build_language_models", "CascadeRetriever"]
